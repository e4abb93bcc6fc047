"""StreamPool: dynamic multi-stream serving with per-slot lifecycles.

BatchedTranscriber (serving.py) handles the lockstep case — B equal-schedule
streams.  Real serving needs streams that join, leave, restart, and drift:
this pool keeps B slots, each with its own mel context, conv tails, ring
caches (rows of batched arrays), and logical positions, and advances all
active slots together in bucketed lockstep device calls (per-slot position
vectors vmapped through parallel/serving.py).

Design points:
  - Live streams produce audio at 1x real time, so lockstep ticks are the
    natural schedule; slots differ only in epoch (admission/restart time),
    which the per-slot position vectors absorb.
  - Admission prefill runs on the single slot (gather row -> prefill ->
    scatter row): rare, so the row copy is irrelevant.
  - Ring masking makes slot reset free — new epochs hide stale KV by
    logical-position arithmetic alone (ops/ring.py).
  - Inactive slots still ride along in device calls (their inputs are
    zeros and their outputs are discarded); with any real occupancy the
    marginal cost is ~zero because the step is weight-read-bound.
  - Decode drains each slot's own adapter backlog with per-slot burst
    lengths quantized to the smallest common bucket; to keep the batch
    uniform, each tick decodes q = min over active slots with backlog, and
    slots with no backlog replay their *parking position* (a harmless
    rewrite of their last decoded position — outputs discarded, KV rewritten
    with identical values).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import (
    N_LEFT_PAD_TOKENS,
    RAW_AUDIO_LENGTH_PER_TOK,
    STREAM_MAX_DECODE_KV,
    TOKEN_EOS,
    TOKEN_STREAMING_PAD,
)
from ..native import make_mel_context
from ..runtime.engine import VoxtralEngine, decompose
from . import serving as sv


@dataclass
class _Slot:
    active: bool = False
    mel_ctx: object = None
    mel_cursor: int = 0
    conv_init: bool = False
    c0_backlog: list = field(default_factory=list)   # [t,1280] np arrays
    enc_backlog: list = field(default_factory=list)
    enc_pos: int = 0
    adapter_buf: Optional[np.ndarray] = None          # [n, dim] f32
    total_adapter: int = 0
    gen_pos: int = 0
    dec_pos: int = 0
    decoder_started: bool = False
    prev_token: int = TOKEN_STREAMING_PAD
    eos_seen: bool = False
    continuous: bool = True
    tokens: list = field(default_factory=list)        # pending output tokens


class StreamPool:
    def __init__(self, engine: VoxtralEngine, n_slots: int,
                 dec_kv_ring: int = 2048):
        self.eng = engine
        self.cfg = engine.cfg
        self.b = n_slots
        cfg = self.cfg
        self.dec_ring = dec_kv_ring
        self.enc_cache = sv.batched_enc_cache(cfg, n_slots, engine.enc_kv_ring)
        self.dec_cache = sv.batched_dec_cache(cfg, n_slots, dec_kv_ring)
        self.c0_tail = jnp.zeros((n_slots, 2, cfg.encoder.n_mel), jnp.float32)
        self.c1_tail = jnp.zeros((n_slots, 2, cfg.encoder.dim), cfg.cdtype)
        self.slots = [_Slot() for _ in range(n_slots)]

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------
    def add_stream(self) -> int:
        for i, s in enumerate(self.slots):
            if not s.active:
                self._reset_slot(i)
                self.slots[i].active = True
                return i
        raise RuntimeError("no free slots")

    def close(self, slot: int):
        self.slots[slot].active = False

    def _reset_slot(self, i: int, keep_tokens: bool = False):
        old = self.slots[i]
        s = _Slot()
        if keep_tokens:
            s.tokens = old.tokens
            s.active = old.active
            s.continuous = old.continuous
        s.mel_ctx = make_mel_context(N_LEFT_PAD_TOKENS * RAW_AUDIO_LENGTH_PER_TOK)
        self.slots[i] = s
        # zero the conv tails for the new epoch; ring caches need nothing
        self.c0_tail = self.c0_tail.at[i].set(0.0)
        self.c1_tail = self.c1_tail.at[i].set(0.0)

    def _reset_slot_decoder(self, i: int):
        s = self.slots[i]
        s.dec_pos = 0
        s.gen_pos = 0
        s.total_adapter = 0
        s.adapter_buf = None
        s.decoder_started = False
        s.prev_token = TOKEN_STREAMING_PAD
        s.eos_seen = False

    # ------------------------------------------------------------------
    # audio in / tokens out
    # ------------------------------------------------------------------
    def feed(self, slot: int, samples: np.ndarray):
        s = self.slots[slot]
        assert s.active
        s.mel_ctx.feed(np.asarray(samples, dtype=np.float32))

    def get(self, slot: int) -> list[int]:
        s = self.slots[slot]
        out = s.tokens
        s.tokens = []
        return out

    # ------------------------------------------------------------------
    # the tick: advance every active slot by uniform bucketed work
    # ------------------------------------------------------------------
    def tick(self, mel_quantum: int = 64):
        self._tick_encoder(mel_quantum)
        self._tick_decoder()

    def _tick_encoder(self, quantum: int):
        eng, cfg = self.eng, self.cfg
        b = self.b
        # uniform quantum: every slot with >= quantum new mel participates;
        # others ride along with zeros (outputs discarded)
        takers = []
        for i, s in enumerate(self.slots):
            avail = (
                s.mel_ctx.mel_frame_offset + s.mel_ctx.n_frames - s.mel_cursor
                if s.active else 0
            )
            takers.append(s.active and avail >= quantum)
        if not any(takers):
            return
        batch_mel = np.zeros((b, quantum, cfg.encoder.n_mel), np.float32)
        for i, s in enumerate(self.slots):
            if not takers[i]:
                continue
            off = s.mel_cursor - s.mel_ctx.mel_frame_offset
            batch_mel[i] = s.mel_ctx.data()[off : off + quantum]
            s.mel_cursor += quantum
            s.mel_ctx.discard_before(s.mel_cursor)

        taker_mask = jnp.asarray(takers)[:, None, None]

        # conv0 over bucketed sub-chunks; non-taker tails must survive the
        # ride-along (their zero inputs would clobber the boundary context)
        c0_tail_old = self.c0_tail
        i0 = 0
        for t in decompose(quantum, eng.buckets):
            out, self.c0_tail = sv.bconv0(
                eng.params["encoder"], cfg,
                jnp.asarray(batch_mel[:, i0 : i0 + t]), self.c0_tail,
            )
            out = np.asarray(out)
            for i, s in enumerate(self.slots):
                if takers[i]:
                    s.c0_backlog.append(out[i])
            i0 += t
        self.c0_tail = jnp.where(taker_mask, self.c0_tail, c0_tail_old)

        # conv1 + encode: quantum is even so every taker gained quantum//2
        # encoder positions; run uniform buckets with per-slot positions
        n_enc = quantum // 2
        c1_tail_old = self.c1_tail
        for t in decompose(n_enc, eng.buckets):
            feed = np.zeros((b, 2 * t, cfg.encoder.dim), np.float32)
            pos = np.zeros(b, np.int32)
            for i, s in enumerate(self.slots):
                if takers[i]:
                    feed[i] = self._take(s.c0_backlog, 2 * t)
                # non-takers park at their own enc_pos: those ring slots hold
                # positions >= cap behind (outside the 750 window) and the
                # slot's next real chunk rewrites them first
                pos[i] = s.enc_pos
            c1, self.c1_tail = sv.bconv1(
                eng.params["encoder"], cfg, jnp.asarray(feed), self.c1_tail
            )
            y, self.enc_cache = sv.bencode(
                eng.params["encoder"], cfg, c1, self.enc_cache,
                jnp.asarray(pos),
            )
            y = np.asarray(y)
            for i, s in enumerate(self.slots):
                if takers[i]:
                    s.enc_pos += t
                    s.enc_backlog.append(y[i])
        self.c1_tail = jnp.where(taker_mask, self.c1_tail, c1_tail_old)

        # adapter on full groups of 4 (uniform across takers by construction)
        groups = min(
            (sum(a.shape[0] for a in s.enc_backlog) // 4)
            for i, s in enumerate(self.slots) if takers[i]
        )
        for g in decompose(groups, eng.buckets):
            x = np.zeros((b, 4 * g, cfg.encoder.dim), np.float32)
            for i, s in enumerate(self.slots):
                if takers[i]:
                    x[i] = self._take(s.enc_backlog, 4 * g)
            rows = np.asarray(
                sv.badapter(eng.params["adapter"], cfg, jnp.asarray(x)),
                dtype=np.float32,
            )
            for i, s in enumerate(self.slots):
                if not takers[i]:
                    continue
                s.adapter_buf = (
                    rows[i] if s.adapter_buf is None
                    else np.concatenate([s.adapter_buf, rows[i]])
                )
                s.total_adapter += g

    @staticmethod
    def _take(backlog: list, n: int) -> np.ndarray:
        taken, got = [], 0
        while got < n:
            head = backlog[0]
            need = n - got
            if head.shape[0] <= need:
                taken.append(head)
                got += head.shape[0]
                backlog.pop(0)
            else:
                taken.append(head[:need])
                backlog[0] = head[need:]
                got = n
        return taken[0] if len(taken) == 1 else np.concatenate(taken)

    def _admit_prefill(self, i: int):
        """Single-slot prefill at admission (row gather -> prefill -> row
        scatter)."""
        eng, cfg = self.eng, self.cfg
        s = self.slots[i]
        L = eng.prompt_len
        rows = eng.prompt_embeds(s.adapter_buf[:L])
        from ..models.decoder import KVCache, prefill

        slot_cache = KVCache(self.dec_cache.k[i], self.dec_cache.v[i])
        slot_cache = prefill(
            eng.params["decoder"], cfg, rows[: L - 1],
            slot_cache, jnp.int32(0), eng.ada(),
        )
        self.dec_cache = type(self.dec_cache)(
            self.dec_cache.k.at[i].set(slot_cache.k),
            self.dec_cache.v.at[i].set(slot_cache.v),
        )
        s.dec_pos = L - 1
        s.gen_pos = L - 1
        s.decoder_started = True

    def _tick_decoder(self):
        eng, cfg = self.eng, self.cfg
        b = self.b
        L = eng.prompt_len
        for i, s in enumerate(self.slots):
            if s.active and not s.decoder_started and s.total_adapter >= L:
                self._admit_prefill(i)

        while True:
            # q: uniform burst over decodable slots this round
            backlogs = [
                (s.total_adapter - s.gen_pos)
                if (s.active and s.decoder_started and not s.eos_seen)
                else 0
                for s in self.slots
            ]
            decodable = [n > 0 for n in backlogs]
            if not any(decodable):
                return
            q = next(
                x for x in eng.buckets
                if x <= min(n for n in backlogs if n > 0)
            )
            chunk = np.zeros((b, q, cfg.decoder.dim), np.float32)
            prev = np.zeros(b, np.int32)
            pos = np.zeros(b, np.int32)
            for i, s in enumerate(self.slots):
                if decodable[i]:
                    chunk[i] = s.adapter_buf[s.gen_pos : s.gen_pos + q]
                    prev[i] = s.prev_token
                    pos[i] = s.dec_pos
                else:
                    # parking: non-decodable slots ride along writing at
                    # their own dec_pos.  Safe for any burst length q: ring
                    # slots (dec_pos .. dec_pos+q-1) mod cap hold positions
                    # >= cap behind — outside the attention window (cap >=
                    # window) — and the next real decode rewrites them
                    # before any query reads them.  Outputs are discarded.
                    pos[i] = self.slots[i].dec_pos
            toks, _, _, _, self.dec_cache = sv.bdecode_burst(
                eng.params["decoder"], cfg, jnp.asarray(chunk),
                jnp.asarray(prev), self.dec_cache, jnp.asarray(pos), eng.ada(),
            )
            toks = np.asarray(toks)
            for i, s in enumerate(self.slots):
                if not decodable[i]:
                    continue
                for t in toks[i]:
                    t = int(t)
                    s.gen_pos += 1
                    s.dec_pos += 1
                    if t == TOKEN_EOS:
                        s.eos_seen = True
                        break
                    s.prev_token = t
                    s.tokens.append(t)
                self._maybe_restart(i)

    def _maybe_restart(self, i: int):
        s = self.slots[i]
        if not s.continuous:
            return
        if s.eos_seen:
            self._reset_slot_decoder(i)
        elif s.dec_pos > min(STREAM_MAX_DECODE_KV, self.dec_ring - 256):
            self._reset_slot_decoder(i)
