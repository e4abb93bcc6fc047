"""Pallas TPU flash bulk attention: T-row sliding-window attention over a
ring cache (the encoder's hot kernel; the reference's Q-tiled
`encoder_attention` Metal kernels, voxtral_shaders.metal:460-860).

The XLA path (ops/ring.py ring_attention) materializes the [KH, T, cap] f32
score tensor in HBM per layer; this kernel keeps scores in VMEM with an
online softmax so per layer only the ring itself moves.

STATUS — measured and REJECTED as the encoder default (docs/PERF.md): at the
full-size encoder shape (ring 1280, 1024-frame chunks) every variant loses
to the XLA path (28.3-30.7 vs 21.6 ms/chunk: BQ 512/128, block 256/full-
ring).  The encoder ring is small enough that XLA's fused attention wins;
unlike the decoder (flash_decode.py), there are no dead ring reads to skip
at cap=window+chunk.  The kernel stays available via
EncoderConfig.attn_impl="flash" (correct, vmap-routed, chunking-invariant)
for shapes where the trade-off differs; "auto" resolves to xla.

Design notes:
  * The per-layer encoder ring is small ([32, 1280, 64] bf16 = 5.2 MB), so
    the kernel takes it as a WHOLE-ARRAY VMEM block per stream and walks it
    with plain ref slices.  Manual `make_async_copy` windows are not an
    option here: the encoder head_dim 64 is below the 128-lane tile and
    Mosaic rejects the lane-padded memref_slice ("slice along dimension 3
    must be aligned to tiling (128)").  The decode kernel (flash_decode.py)
    can use manual DMAs because the decoder's head_dim is 128.
  * Chunking invariance (a repo invariant — CLAUDE.md): the kernel walks ALL
    ring blocks in absolute order (0..cap/block-1) rather than skipping dead
    blocks.  Per query row the masked score values, the block partition, and
    the accumulation order are then functions of the ring STATE only — and
    slot assignment is position-deterministic — so results are bit-identical
    no matter how the feed was chunked.

Like ops/flash_decode.py, the single-stream entry carries a custom_vmap rule
routing `jax.vmap` (the batched serving path) to one batched kernel launch.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 256
MAX_BQ = 128


def _kernel(info_ref, q_ref, k_ref, v_ref, o_ref, *, cap: int, window: int,
            block: int, bq: int, kh: int, g: int, d: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    qp0 = info_ref[b, i, 0]      # logical position of this tile's first row
    pos_hi = info_ref[b, i, 1]   # last position written to the ring
    n_blocks = cap // block

    q = q_ref[0, 0]              # [KH, BQ*G, D] (compute dtype)
    scale = jnp.float32(1.0 / math.sqrt(d))

    # per-row query positions: row r = qi * g + gi -> position qp0 + qi
    qi = jax.lax.broadcasted_iota(jnp.int32, (1, bq * g, 1), 1) // g
    q_pos = qp0 + qi                                     # [1, BQ*G, 1]

    def body(j, carry):
        m, l, acc = carry
        start = pl.multiple_of(j * block, block)
        kb = k_ref[0, :, pl.ds(start, block), :].astype(q.dtype)
        vb = v_ref[0, :, pl.ds(start, block), :].astype(q.dtype)

        scores = jax.lax.dot_general(
            q, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                        # [KH, BQ*G, block]

        slots = start + jax.lax.broadcasted_iota(jnp.int32, (1, 1, block), 2)
        # most recent logical position written at each slot
        logical = pos_hi - jax.lax.rem(pos_hi - slots + cap * 2, cap)
        valid = (
            (logical >= 0) & (logical <= q_pos) & (logical > q_pos - window)
        )                                                # [1, BQ*G, block]
        scores = jnp.where(valid, scores, -jnp.inf)

        m_blk = jnp.max(scores, axis=-1, keepdims=True)  # [KH, BQ*G, 1]
        m_new = jnp.maximum(m, m_blk)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(scores - m_safe)
        p = jnp.where(valid, p, 0.0)
        scale_prev = jnp.exp(jnp.where(jnp.isfinite(m), m - m_safe, -jnp.inf))
        scale_prev = jnp.where(jnp.isfinite(m), scale_prev, 0.0)
        l_new = l * scale_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * scale_prev + jax.lax.dot_general(
            p.astype(q.dtype), vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                # [KH, BQ*G, D]
        return m_new, l_new, acc_new

    m0 = jnp.full((kh, bq * g, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((kh, bq * g, 1), jnp.float32)
    acc0 = jnp.zeros((kh, bq * g, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    o_ref[0, 0] = acc / jnp.maximum(l, 1e-30)


def _round_up(n: int, to: int) -> int:
    return -(-n // to) * to


@functools.partial(
    jax.jit,
    static_argnames=("window", "block", "bq", "interpret", "out_dtype"),
)
def flash_bulk_attention_batched(
    q: jax.Array,          # [B, T, H, D] queries at pos0 .. pos0+T-1
    k_ring: jax.Array,     # [B, KH, cap, D] (this layer's ring, T rows written)
    v_ring: jax.Array,
    pos0: jax.Array,       # [B] int32
    t_total: jax.Array,    # [B] int32: rows actually written (== T normally)
    *,
    window: int,
    block: int | None = None,
    bq: int | None = None,
    interpret: bool | None = None,
    out_dtype=None,
):
    bsz, t, h, d = q.shape
    _, kh, cap, _ = k_ring.shape
    g = h // kh
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block is None:
        # largest 128-multiple divisor of cap <= DEFAULT_BLOCK (caps are
        # 128-aligned but not necessarily powers of two — same fallback as
        # ops/flash_decode.py)
        block = min(DEFAULT_BLOCK, cap)
        while cap % block:
            block -= 128
            if block <= 0:
                block = cap
                break
    assert cap % block == 0, (cap, block)
    out_dtype = out_dtype or q.dtype

    bq = bq or min(MAX_BQ, _round_up(t, 8))
    t_pad = _round_up(t, bq)
    n_i = t_pad // bq
    if t_pad != t:
        q = jnp.pad(q, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))

    # [B, nI, KH, BQ*G, D]: tile the T axis, heads-major for the MXU batch
    q5 = (
        q.reshape(bsz, n_i, bq, kh, g, d)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(bsz, n_i, kh, bq * g, d)
    )

    pos_hi = pos0 + t_total - 1
    ii = jnp.arange(n_i, dtype=jnp.int32)
    info = jnp.stack(
        [
            pos0[:, None] + ii[None, :] * bq,            # tile's first q pos
            jnp.broadcast_to(pos_hi[:, None], (bsz, n_i)),
        ],
        axis=-1,
    ).astype(jnp.int32)                                  # [B, nI, 2]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, n_i),
        in_specs=[
            pl.BlockSpec(
                (1, 1, kh, bq * g, d),
                lambda b, i, info: (b, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # whole per-stream ring as one VMEM block (revisited i-instances
            # reuse it; see module docstring for why not manual DMA windows)
            pl.BlockSpec(
                (1, kh, cap, d), lambda b, i, info: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, kh, cap, d), lambda b, i, info: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, kh, bq * g, d),
            lambda b, i, info: (b, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, cap=cap, window=window, block=block, bq=bq, kh=kh,
            g=g, d=d,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, n_i, kh, bq * g, d), jnp.float32),
        # whole rings + BQ=512 scores need ~55 MB of VMEM; the default
        # scoped limit is 16 MB (v5e has 128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(info, q5, k_ring, v_ring)
    out = (
        out.reshape(bsz, n_i, kh, bq, g, d)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(bsz, t_pad, h, d)[:, :t]
    )
    return out.astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _single_fn(window: int, block, bq, out_dtype_name):
    """Single-stream callable whose custom_vmap rule routes the batched
    serving path (jax.vmap over streams) to one batched kernel launch."""

    def call(q, k_ring, v_ring, pos0, t_total):
        return flash_bulk_attention_batched(
            q, k_ring, v_ring, pos0, t_total, window=window, block=block,
            bq=bq, out_dtype=jnp.dtype(out_dtype_name) if out_dtype_name
            else None,
        )

    @jax.custom_batching.custom_vmap
    def single(q, k_ring, v_ring, pos0):
        t = q.shape[0]
        return call(
            q[None], k_ring[None], v_ring[None], pos0[None],
            jnp.full((1,), t, jnp.int32),
        )[0]

    @single.def_vmap
    def _rule(axis_size, in_batched, q, k_ring, v_ring, pos0):
        qb, kb, vb, pb = in_batched
        assert kb and vb, "rings must be batched over streams"
        bc = lambda x, batched: x if batched else jnp.broadcast_to(
            x, (axis_size,) + jnp.shape(x)
        )
        q = bc(q, qb)
        pos0 = bc(pos0, pb)
        t = q.shape[1]
        out = call(q, k_ring, v_ring, pos0, jnp.full((axis_size,), t, jnp.int32))
        return out, True

    return single


def flash_bulk_attention(
    q: jax.Array,          # [T, H, D]
    k_ring: jax.Array,     # [KH, cap, D] — this layer's ring, already written
    v_ring: jax.Array,
    pos0: jax.Array,       # scalar int32: logical position of q[0]
    *,
    window: int,
    block: int | None = None,
    bq: int | None = None,
    out_dtype=None,
):
    """Returns [T, H, D] sliding-window causal attention over the ring.
    Requires cap >= window + T (the engine's ring-sizing rule) so every
    in-window position is still resident.  vmap-compatible (custom_vmap)."""
    out_dtype_name = jnp.dtype(out_dtype).name if out_dtype else None
    fn = _single_fn(window, block, bq, out_dtype_name)
    return fn(q, k_ring, v_ring, jnp.asarray(pos0, jnp.int32))
