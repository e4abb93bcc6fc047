"""Engine: loaded parameters + compiled programs + shape-bucket policy.

XLA traces one program per input shape, so the engine decomposes every
variable-length chunk into a fixed set of power-of-4 buckets (binary/greedy
decomposition).  Chunked processing is *exact* here — the conv stem carries
explicit tails and the transformer KV rings carry logical positions — so any
partition of the stream produces identical outputs.  This replaces the
reference's arbitrary-length Metal dispatches with a handful of cached XLA
programs (the analog of its warm-up, voxtral.c:163-250).
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    TOKEN_BOS,
    TOKEN_STREAMING_PAD,
    VoxtralConfig,
    delay_tokens_from_ms,
)
from ..models import decoder as dec_mod
from ..models import encoder as enc_mod
from ..models.decoder import KVCache, ada_scales
from ..models.encoder import EncKVCache
from ..tokenizer import TekkenTokenizer

DEFAULT_BUCKETS = (256, 64, 16, 4, 1)


def _pow2ceil(n: int) -> int:
    return 1 << (n - 1).bit_length()


def adaptive_dec_ring(cfg: VoxtralConfig, n_samples: int, slack: int = 64) -> int:
    """Smallest 128-aligned decoder ring that holds a whole clip of
    `n_samples` (prompt + audio tokens + right padding), capped at the
    attention window.  The analog of the reference's grow-to-fit KV cache
    for offline clips (voxtral_decoder.c:214-311).  128-aligned rather than
    power-of-two: ring index math is modular (any cap works) and 128 divides
    the Pallas kernels' block/tile sizes; a 60 s clip then rides an
    896-slot ring instead of 1024 — ~12% less KV traffic and cache memory."""
    from ..config import RAW_AUDIO_LENGTH_PER_TOK, n_right_pad_tokens

    toks = (n_samples + RAW_AUDIO_LENGTH_PER_TOK - 1) // RAW_AUDIO_LENGTH_PER_TOK
    total = (1 + 32 + cfg.delay_tokens) + toks + n_right_pad_tokens(cfg.delay_tokens)
    return min(cfg.decoder.window, max(256, -(-(total + slack) // 128) * 128))


def decompose(n: int, buckets: Sequence[int]) -> list[int]:
    """Greedy largest-first decomposition of n into bucket sizes (buckets must
    include 1 so every n is representable)."""
    out = []
    for b in sorted(buckets, reverse=True):
        while n >= b:
            out.append(b)
            n -= b
    assert n == 0
    return out


class VoxtralEngine:
    """Holds weights in HBM plus everything shape-static. One engine serves
    many streams (vox_ctx_t analog, voxtral.h:150-210)."""

    def __init__(
        self,
        cfg: VoxtralConfig,
        params,
        tokenizer: Optional[TekkenTokenizer] = None,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        dec_kv_ring: Optional[int] = None,
        enc_kv_ring: Optional[int] = None,
        decode_mode: str = "sequential",   # "jacobi" | "auto" (models/jacobi.py)
        jacobi_window: int = 64,
        fused_streaming: bool = True,      # one-call audio side for aligned chunks
        quantize: bool | str = False,      # int8/int4 weight-only decoder
                                           # (False | True/"int8" | "int4")
        param_source=None,                 # () -> {"encoder","adapter"} re-load
                                           # hook enabling offload_encoder()
    ):
        self.cfg = cfg
        self.param_source = param_source
        if quantize:
            # decoder only: that's where the bandwidth-bound traffic is; the
            # encoder stays exact.  Transcripts may differ from bf16 on
            # near-tied tokens (models/quant.py docstring).
            from ..models.quant import quantize_params

            bits = 4 if quantize == "int4" else 8
            params = quantize_params(params, encoder=False, bits=bits)
        self.quantized = quantize
        self.params = params
        self.tokenizer = tokenizer
        assert decode_mode in ("sequential", "jacobi", "auto"), decode_mode
        self.decode_mode = decode_mode
        self.fused_streaming = fused_streaming
        # fused buckets are MEL frames (encoder chunk = bucket/2 positions);
        # keep only sizes the encoder ring can hold alongside its window
        self.fused_buckets = None  # set after enc ring is known (below)
        self.jacobi_window = jacobi_window
        self.jacobi_iters = []   # device scalars; summed lazily in stats
        self.buckets = tuple(sorted(buckets, reverse=True))
        assert self.buckets[-1] == 1
        self.dec_kv_ring = dec_kv_ring or cfg.decoder.kv_ring
        # encoder ring must cover window + the largest chunk written on top;
        # default to the smallest power of two that does (1024 for the real
        # config with 256-buckets) — halves cache memory and attention reads
        # vs a fixed cap.
        min_enc = cfg.encoder.window + self.buckets[0]
        self.enc_kv_ring = enc_kv_ring or min(
            cfg.encoder.kv_ring, _pow2ceil(min_enc)
        )
        assert self.enc_kv_ring >= min_enc
        # Large power-of-two fused buckets only; small chunks (the streaming
        # steady state) run as ONE exact-size program via fused_sizes().
        # 1024-frame chunks measured fastest on chip for batch encodes
        # (474x vs 326x realtime at 512 — fewer O(cap) ring rotates per
        # clip); each bucket needs the ring to hold window + chunk.
        self.fused_buckets = tuple(
            b for b in (1024, 512, 256)
            if cfg.encoder.window + b // 2 <= self.enc_kv_ring
        )

        self.delay_tokens = cfg.delay_tokens
        self._ada = {}  # delay -> [L, dim] device array
        self._ada[self.delay_tokens] = ada_scales(params["decoder"], cfg)

        # device-resident (a D2H fetch of parameter rows can stall remote
        # tunnels; nothing on the host needs these values)
        from ..models.quant import embed_rows

        dparams = params["decoder"]
        self.embed_bos = embed_rows(dparams, jnp.int32(TOKEN_BOS))
        self.embed_pad = embed_rows(dparams, jnp.int32(TOKEN_STREAMING_PAD))

    # -- config ------------------------------------------------------------
    @property
    def prompt_len(self) -> int:
        return 1 + 32 + self.delay_tokens

    def set_delay(self, delay_ms: int):
        """vox_set_delay analog (voxtral.c:1629-1635)."""
        self.delay_tokens = delay_tokens_from_ms(delay_ms)

    def ada(self):
        d = self.delay_tokens
        if d not in self._ada:
            cfg = self.cfg.replace(delay_tokens=d)
            self._ada[d] = ada_scales(self.params["decoder"], cfg)
        return self._ada[d]

    # -- phase-lifetime weight paging -----------------------------------------
    def offload_encoder(self) -> None:
        """Drop the encoder+adapter weights (~2 GB bf16) from HBM for the
        decode phase of a phase-separated batch pipeline — the decode step
        never reads them, and on a 16 GB v5e they are the difference between
        36 and 48+ concurrently decoding streams (bench.py).  The reference
        has no analog: its encoder weights are mmap pages the OS can evict
        (voxtral_safetensors.c:204); on TPU the eviction must be explicit.
        Requires `param_source` so `restore_encoder()` can re-materialize
        them (re-init from seed for random weights, re-read from safetensors
        for a checkpoint — both cheap next to a multi-stream decode phase)."""
        if self.param_source is None:
            raise RuntimeError(
                "offload_encoder() needs the engine's param_source hook "
                "to be able to restore_encoder() later"
            )
        self.params.pop("encoder", None)
        self.params.pop("adapter", None)

    def restore_encoder(self) -> None:
        """Re-materialize offloaded encoder+adapter weights via
        `param_source` (idempotent).  The source must return a mapping with
        ONLY the 'encoder' and 'adapter' entries — materializing a fresh
        decoder alongside the resident one would transiently double the
        biggest allocation."""
        if "encoder" in self.params and "adapter" in self.params:
            return
        if self.param_source is None:
            raise RuntimeError(
                "encoder/adapter weights are missing and the engine has no "
                "param_source hook to re-materialize them (construct the "
                "engine with param_source=... to enable paging/restore)"
            )
        fresh = self.param_source()
        self.params.setdefault("encoder", fresh["encoder"])
        self.params.setdefault("adapter", fresh["adapter"])

    def _encp(self):
        if "encoder" not in self.params:
            self.restore_encoder()
        return self.params["encoder"]

    def _adap(self):
        if "adapter" not in self.params:
            self.restore_encoder()
        return self.params["adapter"]

    # -- memory accounting -----------------------------------------------------
    def memory_ledger(self) -> dict:
        """Shape-derived HBM byte ledger (the vox_metal_memory_used analog,
        voxtral_metal.m:3832, printed at startup voxtral.c:247-249).  The
        axon dev backend does not support ``device.memory_stats()``, so
        callers (CLI, StreamPool.print_stats, bench.py) account residency
        from the arrays themselves: weights by param group (quantized
        storage counts its real packed bytes), device-resident derived
        constants, and per-stream KV-cache bytes at this engine's ring
        geometry.  All values are bytes."""
        def nbytes(tree) -> int:
            return int(sum(x.nbytes for x in jax.tree.leaves(tree)))

        d, e = self.cfg.decoder, self.cfg.encoder
        led = {f"params_{k}": nbytes(v) for k, v in self.params.items()}
        led["derived_consts"] = nbytes(
            [self.embed_bos, self.embed_pad, list(self._ada.values())]
        )
        led["params_total"] = sum(
            v for k, v in led.items() if k.startswith("params_")
        ) + led["derived_consts"]
        led["dec_cache_bytes_per_stream"] = (
            2 * d.n_layers * d.n_kv_heads * self.dec_kv_ring * d.head_dim
            * jnp.dtype(self.cfg.kvdtype).itemsize
        )
        led["enc_cache_bytes_per_stream"] = (
            2 * e.n_layers * e.n_kv_heads * self.enc_kv_ring * e.head_dim
            * jnp.dtype(self.cfg.enc_kvdtype).itemsize
        )
        return led

    # -- cache factories -----------------------------------------------------
    def new_dec_cache(self) -> KVCache:
        return KVCache.create(self.cfg.decoder, self.cfg.kvdtype, self.dec_kv_ring)

    def new_enc_cache(self) -> EncKVCache:
        return EncKVCache.create(
            self.cfg.encoder, self.cfg.enc_kvdtype, self.enc_kv_ring
        )

    # -- dispatch planning ---------------------------------------------------
    def fused_sizes(self, q_total: int) -> list[int]:
        """Dispatch plan (mel-frame chunk sizes) for a quantum-aligned chunk:
        large power-of-two buckets down to 256, then ONE exact-size program
        for the tail — so a steady streaming feed (< 2.6 s) is a single
        device call.  Exact sizes compile once each (few distinct values per
        run; warmup(interval_s=...) precompiles the steady-state ones).  The
        tail is still split if the encoder ring cannot hold window + chunk."""
        cap = 2 * (self.enc_kv_ring - self.cfg.encoder.window)
        cap -= cap % 8
        out = []
        for b in self.fused_buckets:
            while q_total >= b:
                out.append(b)
                q_total -= b
        while q_total > 0:
            q = min(q_total, cap)
            out.append(q)
            q_total -= q
        return out

    def burst_size(self, avail: int) -> int:
        """Decode-burst size for `avail` pending adapter rows.  Small
        backlogs (the per-feed steady state at any -I <= 2.5 s) decode in ONE
        exact-size program; large backlogs use the power buckets.  One
        dispatch per feed instead of a greedy bucket cascade."""
        if avail < 32:
            return avail
        return next(x for x in self.buckets if x <= avail)

    # -- compiled-program wrappers (bucketed) --------------------------------
    def conv0(self, mel: jax.Array, tail: jax.Array):
        return enc_mod.conv0_chunk(
            self._encp(), mel, tail, cdtype_name=self.cfg.compute_dtype
        )

    def conv1(self, feed: jax.Array, tail: jax.Array):
        return enc_mod.conv1_chunk(
            self._encp(), feed, tail, cdtype_name=self.cfg.compute_dtype
        )

    def encode(self, x: jax.Array, cache: EncKVCache, pos0: int):
        return enc_mod.encode_chunk(
            self._encp(), self.cfg, x, cache, jnp.int32(pos0)
        )

    def adapter(self, enc_out: jax.Array) -> jax.Array:
        return enc_mod.adapter_forward(self._adap(), self.cfg, enc_out)

    def fused_encode(self, mel, tails, cache: EncKVCache, enc_pos: int):
        """One-program conv+encoder+adapter for quantum-aligned mel chunks
        (models/fused_stream.py)."""
        from ..models.fused_stream import fused_encode_chunk

        return fused_encode_chunk(
            self._encp(), self._adap(), self.cfg,
            jnp.asarray(mel), tails, cache, jnp.int32(enc_pos),
        )

    def encode_clip_bulk(self, mel) -> jax.Array:
        """Whole-clip offline encode with NO ring state (the reference's
        batch vox_encoder_forward, voxtral.h:309 / voxtral_encoder.c:135-312):
        [Tm, 128] padded mel -> [Tm//8, 3072] f32 adapter rows.  ~5x the
        incremental path offline — banded Pallas attention, no score HBM
        round trips, no O(cap) ring rotates (models/bulk_encode.py)."""
        from ..models.bulk_encode import bulk_encode_clip

        return bulk_encode_clip(
            self._encp(), self._adap(), self.cfg,
            jnp.asarray(mel),
        )

    def encode_clips_bulk(self, mel_b) -> jax.Array:
        """Batched bulk encode: [B, Tm, 128] -> [B, Tm//8, 3072] f32 in one
        program (one banded-kernel launch for all streams)."""
        from ..models.bulk_encode import bulk_encode_clips

        return bulk_encode_clips(
            self._encp(), self._adap(), self.cfg,
            jnp.asarray(mel_b),
        )

    def prefill(self, embeds, cache: KVCache, pos0: int) -> KVCache:
        return dec_mod.prefill(
            self.params["decoder"], self.cfg, jnp.asarray(embeds), cache,
            jnp.int32(pos0), self.ada(),
        )

    def prompt_embeds(self, adapter_rows) -> jax.Array:
        """[L, dim] adapter rows -> prompt embeddings on device:
        row 0 + BOS embed, rows 1.. + STREAMING_PAD embed."""
        rows = jnp.asarray(adapter_rows)
        return jnp.concatenate(
            [rows[:1] + self.embed_bos[None], rows[1:] + self.embed_pad[None]],
            axis=0,
        )

    def decode_burst(self, adapter_chunk, prev_token: int, cache: KVCache,
                     pos0: int, n_alt: int = 0):
        # "auto": Jacobi only for window-sized-or-larger bursts (offline /
        # deep-backlog decode, where it wins >=1.33x even at the adversarial
        # settle rate — tools/jacobi_settle.py); short steady-state streaming
        # bursts keep the sequential program.  Both are greedy-exact, so the
        # per-burst switch cannot change transcripts beyond the documented
        # bf16 near-tie caveat.
        mode = self.decode_mode
        if mode == "auto":
            mode = ("jacobi" if len(adapter_chunk) >= self.jacobi_window
                    else "sequential")
        if mode == "jacobi":
            from ..models.jacobi import decode_burst_jacobi

            t = len(adapter_chunk)
            # largest divisor of t within the window (exact-size bursts are
            # not always window-aligned)
            w = min(self.jacobi_window, t)
            while t % w:
                w -= 1
            toks, ai, ap, bp, cache, iters = decode_burst_jacobi(
                self.params["decoder"], self.cfg, jnp.asarray(adapter_chunk),
                jnp.int32(prev_token), cache, jnp.int32(pos0), self.ada(),
                n_alt=n_alt, window=w,
            )
            self.jacobi_iters.append(iters)
            return toks, ai, ap, bp, cache
        return dec_mod.decode_burst(
            self.params["decoder"], self.cfg, jnp.asarray(adapter_chunk),
            jnp.int32(prev_token), cache, jnp.int32(pos0), self.ada(),
            n_alt=n_alt,
        )

    # -- warm-up -------------------------------------------------------------
    def warmup(self, n_alt: int = 0, progress=None, interval_s: Optional[float] = None):
        """Pre-compile every bucket shape (the analog of vox_metal warm-up;
        avoids first-token compile stalls).  With `interval_s`, also
        precompiles the exact-size fused-encode and decode-burst programs the
        steady streaming state at that processing interval hits."""
        cfg = self.cfg
        t0 = time.monotonic()
        enc_cache = self.new_enc_cache()
        dec_cache = self.new_dec_cache()
        c0_tail = jnp.zeros((2, cfg.encoder.n_mel), jnp.float32)
        c1_tail = jnp.zeros((2, cfg.encoder.dim), cfg.cdtype)
        for b in self.buckets:
            if progress:
                progress(f"warmup bucket {b} (+{time.monotonic() - t0:.0f}s)")
            mel = jnp.zeros((b, cfg.encoder.n_mel), jnp.float32)
            c0, _ = self.conv0(mel, c0_tail)
            feed = jnp.zeros((2 * b, cfg.encoder.dim), cfg.cdtype)
            c1, _ = self.conv1(feed, c1_tail)
            x = jnp.zeros((b, cfg.encoder.dim), cfg.cdtype)
            y, enc_cache = self.encode(x, enc_cache, 0)
            a_in = jnp.zeros((4 * b, cfg.encoder.dim), cfg.cdtype)
            self.adapter(a_in)
            chunk = jnp.zeros((b, cfg.decoder.dim), cfg.cdtype)
            out = self.decode_burst(chunk, TOKEN_BOS, dec_cache, 0, n_alt=n_alt)
            dec_cache = out[-1]
        if progress:
            progress(f"warmup prefill (+{time.monotonic() - t0:.0f}s)")
        pf = jnp.zeros((self.prompt_len - 1, cfg.decoder.dim), jnp.float32)
        dec_cache = self.prefill(np.asarray(pf), dec_cache, 0)
        fused_qs = list(self.fused_buckets)
        burst_ts = []
        if interval_s is not None:
            # steady-state sizes at this processing interval: a feed carries
            # ~interval*100 mel frames; the aligned chunk alternates between
            # q0 and q0+8 as the <8-frame remainder accumulates
            q0 = max(8, (int(interval_s * 100) // 8) * 8)
            fused_qs += [
                q for q in (q0, q0 + 8)
                if q not in fused_qs
                and cfg.encoder.window + q // 2 <= self.enc_kv_ring
            ]
            burst_ts = sorted({q0 // 8, q0 // 8 + 1})
        if self.fused_streaming:
            from ..models.fused_stream import ConvTails

            tails = ConvTails.create(cfg)
            for q in fused_qs:
                if progress:
                    progress(f"warmup fused {q} (+{time.monotonic() - t0:.0f}s)")
                mel = jnp.zeros((q, cfg.encoder.n_mel), jnp.float32)
                _, tails, enc_cache = self.fused_encode(mel, tails, enc_cache, 0)
        for t in burst_ts:
            if t in self.buckets:
                continue
            if progress:
                progress(f"warmup burst {t} (+{time.monotonic() - t0:.0f}s)")
            chunk = jnp.zeros((t, cfg.decoder.dim), jnp.float32)
            out = self.decode_burst(chunk, TOKEN_BOS, dec_cache, 0, n_alt=n_alt)
            dec_cache = out[-1]
        jax.block_until_ready(dec_cache.k)
        return time.monotonic() - t0
