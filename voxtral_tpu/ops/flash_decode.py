"""Pallas TPU flash-decode: single-token GQA attention over the ring cache.

The XLA path (ops/ring.py) reads the ENTIRE ring every step and masks — for
big rings that is dead HBM traffic when only part of the window is live.
This kernel is the TPU analog of the reference's single-SIMD decoder
attention Metal kernel (voxtral_shaders.metal:292-372, SPEED.md:160-169): it
streams ONLY the ring blocks intersecting the live window, with an online
softmax, double-buffering the HBM→VMEM block DMAs.

Valid slots form a contiguous mod-cap interval [pos-valid+1 .. pos]; the
kernel walks the ring blocks that intersect it.  Per-slot masking inside a
block uses the same logical-position arithmetic as ops/ring.py.

Layouts: q [B, KH, G, D]; k/v rings [B, KH, cap, D]; per-stream positions.
Grid = (B, KH).  The single-stream entry wraps B=1, and a custom_vmap rule
routes `jax.vmap(flash_decode_attention)` (the batched serving path) to the
same batched kernel instead of failing or falling back.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 512


def _kernel(info_ref, q_ref, k_hbm, v_hbm, o_ref, k_buf, v_buf, sem,
            *, cap: int, window: int, block: int, g: int, d: int):
    b = pl.program_id(0)
    kh = pl.program_id(1)
    pos = info_ref[b, 0]
    lo_block = info_ref[b, 1]
    nb = info_ref[b, 2]
    n_blocks = cap // block

    q = q_ref[0, 0].astype(jnp.float32) * (1.0 / math.sqrt(d))  # [G, D]

    def get_dma(slot, j):
        bidx = jax.lax.rem(lo_block + j, n_blocks)
        start = pl.multiple_of(bidx * block, block)
        return (
            pltpu.make_async_copy(
                k_hbm.at[b, kh, pl.ds(start, block), :], k_buf.at[slot],
                sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[b, kh, pl.ds(start, block), :], v_buf.at[slot],
                sem.at[slot, 1],
            ),
            bidx,
        )

    kd0, vd0, _ = get_dma(0, 0)
    kd0.start()
    vd0.start()

    def body(j, carry):
        m, l, acc = carry
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < nb)
        def _():
            kd, vd, _ = get_dma(1 - slot, j + 1)
            kd.start()
            vd.start()

        kd, vd, bidx = get_dma(slot, j)
        kd.wait()
        vd.wait()

        kb = k_buf[slot].astype(jnp.float32)          # [block, D]
        vb = v_buf[slot].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # [G, block]

        slots = bidx * block + jax.lax.broadcasted_iota(
            jnp.int32, (1, block), 1
        )                                              # [1, block]
        logical = pos - jax.lax.rem(pos - slots + cap * 2, cap)
        valid = (logical >= 0) & (logical > pos - window) & (logical <= pos)
        scores = jnp.where(valid, scores, -jnp.inf)

        m_blk = jnp.max(scores, axis=-1, keepdims=True)        # [G, 1]
        m_new = jnp.maximum(m, m_blk)
        # guard: fully-masked block would give exp(-inf - -inf) = nan
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(scores - m_safe)
        p = jnp.where(valid, p, 0.0)
        scale_prev = jnp.exp(jnp.where(jnp.isfinite(m), m - m_safe, -jnp.inf))
        scale_prev = jnp.where(jnp.isfinite(m), scale_prev, 0.0)
        l_new = l * scale_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * scale_prev + jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((g, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((g, 1), jnp.float32)
    acc0 = jnp.zeros((g, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nb, body, (m0, l0, acc0))
    o_ref[0, 0] = acc / jnp.maximum(l, 1e-30)


def _info(pos, cap: int, window: int, block: int):
    """Per-stream [3] int32: (pos, first ring block, number of blocks)."""
    n_blocks = cap // block
    valid = jnp.minimum(jnp.minimum(pos + 1, window), cap)
    lo_slot = jnp.mod(pos - valid + 1, cap)
    lo_block = lo_slot // block
    nb = (jnp.mod(lo_slot, block) + valid + block - 1) // block
    nb = jnp.minimum(nb, n_blocks)
    return jnp.stack([pos, lo_block, nb], axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("window", "block", "interpret", "out_dtype")
)
def flash_decode_attention_batched(
    q: jax.Array,          # [B, H, D]
    k_ring: jax.Array,     # [B, KH, cap, D]
    v_ring: jax.Array,
    pos: jax.Array,        # [B] int32 per-stream positions
    *,
    window: int,
    block: int | None = None,
    interpret: bool | None = None,
    out_dtype=None,
):
    bsz, h, d = q.shape
    _, kh, cap, _ = k_ring.shape
    g = h // kh
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block = block or min(DEFAULT_BLOCK, cap)
    assert cap % block == 0, (cap, block)
    out_dtype = out_dtype or q.dtype

    info = _info(pos, cap, window, block)           # [B, 3]
    qg = q.reshape(bsz, kh, g, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, kh),
        in_specs=[
            pl.BlockSpec((1, 1, g, d), lambda b, i, info: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda b, i, info: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, block, d), k_ring.dtype),
            pltpu.VMEM((2, block, d), v_ring.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, cap=cap, window=window, block=block, g=g, d=d
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, kh, g, d), jnp.float32),
        interpret=interpret,
    )(info, qg, k_ring, v_ring)
    return out.reshape(bsz, h, d).astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _single_fn(window: int, block, out_dtype_name):
    """Single-stream callable with a custom_vmap rule routing the batched
    serving path (jax.vmap over streams) to the batched kernel."""

    @jax.custom_batching.custom_vmap
    def single(q, k_ring, v_ring, pos):
        out = flash_decode_attention_batched(
            q[None], k_ring[None], v_ring[None], pos[None],
            window=window, block=block,
            out_dtype=jnp.dtype(out_dtype_name) if out_dtype_name else None,
        )
        return out[0]

    @single.def_vmap
    def _rule(axis_size, in_batched, q, k_ring, v_ring, pos):
        qb, kb, vb, pb = in_batched
        bc = lambda x, batched: x if batched else jax.tree.map(
            lambda a: jnp.broadcast_to(a, (axis_size,) + a.shape), x
        )
        q = bc(q, qb)
        k_ring = bc(k_ring, kb)
        v_ring = bc(v_ring, vb)
        pos = bc(pos, pb)
        out = flash_decode_attention_batched(
            q, k_ring, v_ring, pos, window=window, block=block,
            out_dtype=jnp.dtype(out_dtype_name) if out_dtype_name else None,
        )
        return out, True

    return single


def flash_decode_attention(
    q: jax.Array,          # [H, D] queries for ONE position
    k_ring: jax.Array,     # [KH, cap, D]
    v_ring: jax.Array,
    pos: jax.Array,        # scalar int32: this query's (already written) pos
    *,
    window: int,
    block: int | None = None,
    interpret: bool | None = None,
    out_dtype=None,
):
    """Returns [H, D] attention output for the single query at `pos`.
    vmap-compatible: batching over streams dispatches the (B, KH)-grid
    kernel via a custom_vmap rule."""
    del interpret  # auto-selected inside the batched entry
    out_dtype_name = jnp.dtype(out_dtype).name if out_dtype else None
    fn = _single_fn(window, block, out_dtype_name)
    return fn(q, k_ring, v_ring, jnp.asarray(pos, jnp.int32))
