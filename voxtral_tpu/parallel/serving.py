"""Multi-stream batched serving: N concurrent transcriptions per chip.

The reference is strictly one stream per process (SURVEY.md §2.12).  On TPU
the decode step is HBM-bandwidth-bound on weight reads, so batching B streams
through one step costs nearly the same wall time as one stream — aggregate
throughput scales ~linearly until compute or KV traffic dominates.  This
module vmaps the single-stream programs over a stream axis; with a device
mesh the batch axis shards over `dp` and heads/FFN over `tp` (parallel/mesh).

All batched programs take PER-STREAM position vectors (vmapped), so they
serve both the lockstep `BatchedTranscriber` below (equal-length inputs —
the benchmark / batch-serving shape) and the dynamic per-slot scheduler in
parallel/scheduler.py.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TOKEN_EOS, TOKEN_STREAMING_PAD, VoxtralConfig
from ..models import decoder as dec_mod
from ..models import encoder as enc_mod
from ..models.decoder import KVCache
from ..models.encoder import EncKVCache
from ..runtime.engine import decompose

PyTree = Any


# --- batched jitted programs (stream axis = axis 0 of data/caches) ----------

@partial(jax.jit, static_argnames=("cfg",))
def bconv0(enc_params, cfg: VoxtralConfig, mel, tail):
    f = lambda m, t: enc_mod.conv0_chunk(enc_params, m, t, cdtype_name=cfg.compute_dtype)
    return jax.vmap(f)(mel, tail)


@partial(jax.jit, static_argnames=("cfg",))
def bconv1(enc_params, cfg: VoxtralConfig, feed, tail):
    f = lambda x, t: enc_mod.conv1_chunk(enc_params, x, t, cdtype_name=cfg.compute_dtype)
    return jax.vmap(f)(feed, tail)


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def bencode(enc_params, cfg: VoxtralConfig, x, cache: EncKVCache, pos0):
    """pos0: [B] per-slot encoder positions (broadcast a scalar for lockstep)."""
    f = lambda xi, ci, pi: enc_mod.encode_chunk(enc_params, cfg, xi, ci, pi)
    return jax.vmap(f)(x, cache, pos0)


@partial(jax.jit, static_argnames=("cfg",))
def badapter(adapter_params, cfg: VoxtralConfig, x):
    return jax.vmap(lambda xi: enc_mod.adapter_forward(adapter_params, cfg, xi))(x)


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def bprefill(dec_params, cfg: VoxtralConfig, embeds, cache: KVCache, pos0, ada):
    """pos0: [B] per-slot decode positions.

    unroll_layers: the scan-based prefill carries the whole stacked cache,
    and under stream-vmap XLA re-lays it out layer-major — two full-cache
    HLO-temp copies (2 x 2.49 GB at B=56 x ring 896) that capped the batch
    size.  The static layer loop keeps every ring update a constant-index
    in-place DUS (measured round 3; decoder.decoder_forward docstring)."""
    f = lambda e, c, pi: dec_mod.prefill(
        dec_params, cfg, e, c, pi, ada, unroll_layers=True
    )
    return jax.vmap(f)(embeds, cache, pos0)


@partial(
    jax.jit, static_argnames=("cfg", "n_alt"), donate_argnames=("cache",)
)
def bdecode_burst(dec_params, cfg: VoxtralConfig, chunks, prev, cache: KVCache,
                  pos0, ada, n_alt: int = 0):
    """pos0: [B] per-slot decode positions.

    Batched bursts force the flash-decode path for bf16 rings regardless
    of ring size: the flat single-instance Pallas kernel reads only the
    live KV window (1.59 vs 2.84 GiB whole-ring at B=32 x ring 896
    mid-clip) and measured 13.78 vs 14.92 ms/step on chip (decode_profile
    + microbench MB_ATTN A/B, round 3).  fp8 rings do NOT flash: the
    in-VMEM fp8->f32 widening runs on the VPU at element rate and
    measured 31.2 ms (flat) / 29.3 (grid) vs 10.2 XLA at B=56 x ring 896
    mid-clip (fill pos ~806; an earlier near-empty-ring reading hid
    this).  XLA fuses the widening into its attention loop and keeps the
    halved HBM bytes win.  B=1 keeps the decoder's own auto rule."""
    if (cfg.decoder.attn_impl == "auto" and cache.k.shape[0] > 1
            and jnp.issubdtype(cache.k.dtype, jnp.floating)
            and cache.k.dtype.itemsize >= 2):
        cfg = cfg.replace(
            decoder=dataclasses.replace(cfg.decoder, attn_impl="flash")
        )
    f = lambda ch, pv, c, pi: dec_mod.decode_burst(
        dec_params, cfg, ch, pv, c, pi, ada, n_alt=n_alt
    )
    return jax.vmap(f)(chunks, prev, cache, pos0)


def batched_dec_cache(cfg: VoxtralConfig, batch: int, cap: Optional[int] = None,
                      sharding=None) -> KVCache:
    cap = cap or cfg.decoder.kv_ring
    d = cfg.decoder
    shape = (batch, d.n_layers, d.n_kv_heads, cap, d.head_dim)
    z = (jnp.zeros(shape, cfg.kvdtype) if sharding is None
         else jax.device_put(jnp.zeros(shape, cfg.kvdtype), sharding))
    return KVCache(z, jnp.copy(z) if sharding is None else z + 0)


def batched_enc_cache(cfg: VoxtralConfig, batch: int, cap: Optional[int] = None,
                      sharding=None) -> EncKVCache:
    cap = cap or cfg.encoder.kv_ring
    e = cfg.encoder
    shape = (batch, e.n_layers, e.n_kv_heads, cap, e.head_dim)
    z = (jnp.zeros(shape, cfg.enc_kvdtype) if sharding is None
         else jax.device_put(jnp.zeros(shape, cfg.enc_kvdtype), sharding))
    return EncKVCache(z, jnp.copy(z) if sharding is None else z + 0)


class BatchedTranscriber:
    """Lockstep batched offline/streaming transcription of B equal-schedule
    streams (the 16-streams-per-chip serving shape, BASELINE.json config 5)."""

    def __init__(self, engine, batch: int, dec_kv_ring: Optional[int] = None):
        self.eng = engine
        self.cfg = engine.cfg
        self.b = batch
        cfg = self.cfg
        self.dec_ring = dec_kv_ring or engine.dec_kv_ring
        self.enc_cache = batched_enc_cache(cfg, batch, engine.enc_kv_ring)
        self.dec_cache = batched_dec_cache(cfg, batch, self.dec_ring)
        self.c0_tail = jnp.zeros((batch, 2, cfg.encoder.n_mel), jnp.float32)
        self.c1_tail = jnp.zeros((batch, 2, cfg.encoder.dim), cfg.cdtype)
        self.enc_pos = 0
        self.c0_backlog: list = []   # device arrays [B, t, 1280]
        self.enc_backlog: list = []
        self.adapter_bufs: list = []  # device arrays [B, g, dim]
        self._adapter_cursor = 0      # rows of adapter_bufs[0] consumed
        self.total_adapter = 0
        self.decoder_started = False
        self.gen_pos = 0
        self.prev = np.full(batch, TOKEN_STREAMING_PAD, np.int32)
        self.done = np.zeros(batch, bool)
        self.tokens: list[list[int]] = [[] for _ in range(batch)]
        self.decode_steps = 0
        self.decode_time = 0.0
        self.encode_time = 0.0

    def _take(self, backlog: list, n: int):
        """Pop n rows (axis 1) from a list of device arrays.  Stays on
        device: slice/concat shapes are periodic in the interval pattern, so
        the jit cache stays bounded."""
        taken, got = [], 0
        while got < n:
            head = backlog[0]
            need = n - got
            if head.shape[1] <= need:
                taken.append(head)
                got += head.shape[1]
                backlog.pop(0)
            else:
                taken.append(jax.lax.slice_in_dim(head, 0, need, axis=1))
                backlog[0] = jax.lax.slice_in_dim(
                    head, need, head.shape[1], axis=1
                )
                got = n
        return taken[0] if len(taken) == 1 else jnp.concatenate(taken, axis=1)

    def feed_mel(self, mel: np.ndarray):
        """mel: [B, T, 128] new frames for every stream (lockstep)."""
        eng, cfg = self.eng, self.cfg
        t0 = time.monotonic()
        t_new = mel.shape[1]
        i = 0
        # _encp()/_adap() (not params[...]): auto-restore after a paging
        # offload_encoder() — encode paths must self-heal (test_paging.py)
        for b in decompose(t_new, eng.buckets):
            out, self.c0_tail = bconv0(
                eng._encp(), cfg, jnp.asarray(mel[:, i : i + b]),
                self.c0_tail,
            )
            self.c0_backlog.append(out)
            i += b
        avail = sum(a.shape[1] for a in self.c0_backlog)
        for b in decompose(avail // 2, eng.buckets):
            feed = self._take(self.c0_backlog, 2 * b)
            c1, self.c1_tail = bconv1(eng._encp(), cfg, feed, self.c1_tail)
            y, self.enc_cache = bencode(
                eng._encp(), cfg, c1, self.enc_cache,
                jnp.full((self.b,), self.enc_pos, jnp.int32),
            )
            self.enc_pos += b
            self.enc_backlog.append(y)
        avail_e = sum(a.shape[1] for a in self.enc_backlog)
        for g in decompose(avail_e // 4, eng.buckets):
            x = self._take(self.enc_backlog, 4 * g)
            rows = badapter(eng._adap(), cfg, x)
            self.adapter_bufs.append(rows.astype(jnp.float32))
            self.total_adapter += g
        jax.block_until_ready(self.enc_cache.k)
        self.encode_time += time.monotonic() - t0

    def _take_adapter(self, n: int):
        """Pop n adapter rows (device) — prompt prefill consumes rows 0..L-2
        and bursts consume rows from gen_pos on; both walk the same queue."""
        return self._take(self.adapter_bufs, n)

    def run_decoder(self):
        eng, cfg = self.eng, self.cfg
        L = eng.prompt_len
        if not self.decoder_started:
            if self.total_adapter < L:
                return
            raw = self._take_adapter(L)                     # [B, L, dim]
            # row L-1 is also the first burst's adapter row (the burst step
            # at position L-1 adds tok_embed(PAD) itself): push it back raw
            self.adapter_bufs.insert(0, raw[:, L - 1 :])
            bos = eng.embed_bos[None, None, :]
            pad = eng.embed_pad[None, None, :]
            prompt = jnp.concatenate(
                [raw[:, :1] + bos, raw[:, 1 : L - 1] + pad], axis=1
            )                                               # [B, L-1, dim]
            t0 = time.monotonic()
            self.dec_cache = bprefill(
                eng.params["decoder"], cfg, prompt,
                self.dec_cache, jnp.zeros((self.b,), jnp.int32), eng.ada(),
            )
            jax.block_until_ready(self.dec_cache.k)
            self.decode_time += time.monotonic() - t0
            self.gen_pos = L - 1
            self.decoder_started = True
        while self.gen_pos < self.total_adapter:
            avail = self.total_adapter - self.gen_pos
            b = next(x for x in eng.buckets if x <= avail)
            chunk = self._take_adapter(b)
            t0 = time.monotonic()
            toks, _, _, _, self.dec_cache = bdecode_burst(
                eng.params["decoder"], cfg, chunk, jnp.asarray(self.prev),
                self.dec_cache, jnp.full((self.b,), self.gen_pos, jnp.int32),
                eng.ada(),
            )
            toks = np.asarray(toks)    # [B, b]
            self.decode_time += time.monotonic() - t0
            self.decode_steps += b
            for s in range(self.b):
                if self.done[s]:
                    continue
                for t in toks[s]:
                    t = int(t)
                    if t == TOKEN_EOS:
                        self.done[s] = True
                        break
                    self.tokens[s].append(t)
            self.prev = toks[:, -1].astype(np.int32)
            self.gen_pos += b

    def transcribe(self, mel_batches: np.ndarray, interval_frames: int = 200):
        """mel_batches: [B, T_total, 128] full padded mel per stream.  Feeds
        `interval_frames` at a time, decoding after each chunk."""
        t = mel_batches.shape[1]
        i = 0
        while i < t:
            n = min(interval_frames, t - i)
            self.feed_mel(mel_batches[:, i : i + n])
            self.run_decoder()
            i += n
        return self.tokens
