"""Pallas TPU flash-decode: single-token GQA attention over the ring cache.

The XLA path (ops/ring.py) reads the ENTIRE ring every step and masks — for
the 8192-slot decoder ring that is 872 MB/step of dead HBM traffic when only
a few hundred positions are live.  This kernel is the TPU analog of the
reference's single-SIMD decoder_attention Metal kernel
(voxtral_shaders.metal:292-372, SPEED.md:160-169): it streams ONLY the blocks
of the ring that hold positions inside the sliding window, with an online-
softmax accumulator, double-buffering the HBM->VMEM block DMAs.

Valid slots form a contiguous mod-cap interval [pos-valid+1 .. pos]; the
kernel walks ceil-wise over the ring blocks that intersect it.  Per-slot
masking inside a block uses the same logical-position arithmetic as
ops/ring.py.

Layout: q [KH, G, D]; k/v rings [KH, cap, D] (head-major, slot-contiguous).
Grid = (KH,).  bf16 rings, f32 scores/softmax/accumulator.
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
    kh = pl.program_id(0)
    pos = info_ref[0]
    lo_block = info_ref[1]
    nb = info_ref[2]
    n_blocks = cap // block

    q = q_ref[0].astype(jnp.float32) * (1.0 / math.sqrt(d))  # [G, D]

    def get_dma(slot, j):
        bidx = jax.lax.rem(lo_block + j, n_blocks)
        start = pl.multiple_of(bidx * block, block)
        return (
            pltpu.make_async_copy(
                k_hbm.at[kh, pl.ds(start, block), :], k_buf.at[slot],
                sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[kh, pl.ds(start, block), :], v_buf.at[slot],
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
    o_ref[0] = acc / jnp.maximum(l, 1e-30)


@functools.partial(
    jax.jit, static_argnames=("window", "block", "interpret", "out_dtype")
)
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
    """Returns [H, D] attention output for the single query at `pos`."""
    h, d = q.shape
    kh, cap, _ = k_ring.shape
    g = h // kh
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block = block or min(DEFAULT_BLOCK, cap)
    assert cap % block == 0, (cap, block)
    out_dtype = out_dtype or q.dtype
    n_blocks = cap // block

    valid = jnp.minimum(jnp.minimum(pos + 1, window), cap)
    lo_slot = jnp.mod(pos - valid + 1, cap)
    lo_block = lo_slot // block
    # number of ring blocks intersecting [lo_slot, lo_slot + valid)
    nb = (jnp.mod(lo_slot, block) + valid + block - 1) // block
    nb = jnp.minimum(nb, n_blocks)
    info = jnp.stack([pos, lo_block, nb]).astype(jnp.int32)

    qg = q.reshape(kh, g, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kh,),
        in_specs=[
            pl.BlockSpec((1, g, d), lambda i, info: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, g, d), lambda i, info: (i, 0, 0),
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
        out_shape=jax.ShapeDtypeStruct((kh, g, d), jnp.float32),
        interpret=interpret,
    )(info, qg, k_ring, v_ring)
    return out.reshape(h, d).astype(out_dtype)
