"""Pallas TPU flash-decode: single-token GQA attention over the ring cache.

The XLA path (ops/ring.py) reads the ENTIRE ring every step and masks — for
big rings that is dead HBM traffic when only part of the window is live.
This kernel is the TPU analog of the reference's single-SIMD decoder
attention Metal kernel (voxtral_shaders.metal:292-372, SPEED.md:160-169): it
streams ONLY the ring blocks intersecting the live window, with an online
softmax, double-buffering the HBM→VMEM block DMAs.

Two design points bought the serving-shape win (docs/PERF.md):
  * The kernel takes the STACKED [L, KH, cap, D] cache plus a layer index
    and slices the layer inside its DMAs.  Feeding it a pre-sliced
    `k_all[li]` instead forces XLA to MATERIALIZE the gathered layer ring
    as a real buffer for the pallas operand (~134 MB per layer per step at
    B=16 / cap 2048) — the fused-gather read the XLA attention path gets
    for free.  Measured: flash at cap 2048 went from 19.5 ms/step (sliced
    operand) to beating XLA once stacked.
  * grid = (B,), ALL kv heads per instance: each block DMA moves
    [KH, block, D] at once — KHx bigger transfers and KHx fewer grid
    instances than a (B, KH) grid, amortizing DMA setup.

Valid slots form a contiguous mod-cap interval [pos-valid+1 .. pos]; the
kernel walks the ring blocks that intersect it.  Per-slot masking inside a
block uses the same logical-position arithmetic as ops/ring.py.

The single-stream entry wraps B=1, and a custom_vmap rule routes
`jax.vmap(flash_decode_attention)` (the batched serving path) to the same
batched kernel instead of failing or falling back.
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
            *, cap: int, window: int, block: int, kh: int, g: int, d: int):
    b = pl.program_id(0)
    pos = info_ref[b, 0]
    lo_block = info_ref[b, 1]
    nb = info_ref[b, 2]
    li = info_ref[b, 3]
    n_blocks = cap // block

    q = q_ref[0].astype(jnp.float32) * (1.0 / math.sqrt(d))  # [KH, G, D]

    def get_dma(slot, j):
        bidx = jax.lax.rem(lo_block + j, n_blocks)
        start = pl.multiple_of(bidx * block, block)
        return (
            pltpu.make_async_copy(
                k_hbm.at[b, li, :, pl.ds(start, block), :], k_buf.at[slot],
                sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[b, li, :, pl.ds(start, block), :], v_buf.at[slot],
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

        kb = k_buf[slot].astype(jnp.float32)          # [KH, block, D]
        vb = v_buf[slot].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                              # [KH, G, block]

        slots = bidx * block + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, block), 2
        )                                              # [1, 1, block]
        logical = pos - jax.lax.rem(pos - slots + cap * 2, cap)
        valid = (logical >= 0) & (logical > pos - window) & (logical <= pos)
        scores = jnp.where(valid, scores, -jnp.inf)

        m_blk = jnp.max(scores, axis=-1, keepdims=True)        # [KH, G, 1]
        m_new = jnp.maximum(m, m_blk)
        # guard: fully-masked block would give exp(-inf - -inf) = nan
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(scores - m_safe)
        p = jnp.where(valid, p, 0.0)
        scale_prev = jnp.exp(jnp.where(jnp.isfinite(m), m - m_safe, -jnp.inf))
        scale_prev = jnp.where(jnp.isfinite(m), scale_prev, 0.0)
        l_new = l * scale_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * scale_prev + jax.lax.dot_general(
            p, vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                              # [KH, G, D]
        return m_new, l_new, acc_new

    m0 = jnp.full((kh, g, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((kh, g, 1), jnp.float32)
    acc0 = jnp.zeros((kh, g, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nb, body, (m0, l0, acc0))
    o_ref[0] = acc / jnp.maximum(l, 1e-30)


def _kernel_flat(info_ref, total_ref, qg_ref, k_hbm, v_hbm, o_ref,
                 k_buf, v_buf, sem, *, cap: int, window: int, block: int,
                 kh: int, g: int, d: int, bsz: int):
    """Single-instance variant: grid=(1,), ONE software-pipelined DMA stream
    walking every (stream, live-block) pair b-major.

    The (B,)-grid kernel pays per-instance entry/exit + first-DMA latency
    for every stream x layer (832 instances/step at B=32), which capped it
    at ~196 GiB/s on the live KV (decode_profile, round 3).  Here the
    double-buffered pipeline never drains at stream boundaries: iteration t
    computes (b, j) while the DMA for the NEXT pair is in flight, so the
    whole layer's KV read sustains DMA throughput.  Accumulators live in
    the loop carry and reset at each stream's last block; outputs store to
    the [B, KH, G, D] VMEM block at the stream's dynamic row."""
    n_blocks = cap // block
    total = total_ref[0]

    def dmas(slot, b, j):
        bidx = jax.lax.rem(info_ref[b, 1] + j, n_blocks)
        start = pl.multiple_of(bidx * block, block)
        li = info_ref[b, 3]
        return (
            pltpu.make_async_copy(
                k_hbm.at[b, li, :, pl.ds(start, block), :], k_buf.at[slot],
                sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[b, li, :, pl.ds(start, block), :], v_buf.at[slot],
                sem.at[slot, 1],
            ),
            bidx,
        )

    def nxt(b, j):
        wrap = (j + 1) >= info_ref[b, 2]
        return (
            jnp.where(wrap, jnp.minimum(b + 1, bsz - 1), b),
            jnp.where(wrap, 0, j + 1),
        )

    kd0, vd0, _ = dmas(0, 0, 0)
    kd0.start()
    vd0.start()

    def body(t, carry):
        b, j, m, l, acc = carry
        bn, jn = nxt(b, j)
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < total)
        def _():
            kd, vd, _ = dmas(1 - slot, bn, jn)
            kd.start()
            vd.start()

        kd, vd, bidx = dmas(slot, b, j)
        kd.wait()
        vd.wait()

        pos = info_ref[b, 0]
        q = qg_ref[b].astype(jnp.float32) * (1.0 / math.sqrt(d))
        kb = k_buf[slot].astype(jnp.float32)
        vb = v_buf[slot].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                              # [KH, G, block]
        slots_i = bidx * block + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, block), 2
        )
        logical = pos - jax.lax.rem(pos - slots_i + cap * 2, cap)
        valid = (logical >= 0) & (logical > pos - window) & (logical <= pos)
        scores = jnp.where(valid, scores, -jnp.inf)

        m_blk = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(scores - m_safe)
        p = jnp.where(valid, p, 0.0)
        scale_prev = jnp.exp(jnp.where(jnp.isfinite(m), m - m_safe, -jnp.inf))
        scale_prev = jnp.where(jnp.isfinite(m), scale_prev, 0.0)
        l_new = l * scale_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * scale_prev + jax.lax.dot_general(
            p, vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

        last = (j + 1) >= info_ref[b, 2]

        @pl.when(last)
        def _():
            o_ref[pl.ds(b, 1)] = (
                acc_new / jnp.maximum(l_new, 1e-30)
            )[None]

        m2 = jnp.where(last, -jnp.inf, m_new)
        l2 = jnp.where(last, 0.0, l_new)
        acc2 = jnp.where(last, 0.0, acc_new)
        return bn, jn, m2, l2, acc2

    m0 = jnp.full((kh, g, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((kh, g, 1), jnp.float32)
    acc0 = jnp.zeros((kh, g, d), jnp.float32)
    jax.lax.fori_loop(
        0, total, body, (jnp.int32(0), jnp.int32(0), m0, l0, acc0)
    )


def _kernel_flat_fused(info_ref, total_ref, qg_ref, kn_ref, vn_ref,
                       k_in, v_in, o_ref, k_out, v_out,
                       k_buf, v_buf, sem, kw_buf, vw_buf, wsem,
                       *, cap: int, window: int, block: int,
                       kh: int, g: int, d: int, bsz: int, win: int):
    """Flat kernel fused with the per-step KV row write.

    The decode step previously paid TWO Pallas launches per layer (the
    batched ring_rows_write, then attention) — 52 launches/step at 26
    layers, each with entry/exit + first-DMA latency (the rowwrite term
    alone profiled at 9.85 ms/step isolated, decode_profile round 3).
    Here one launch does both:

      * attention walks the live blocks with the CURRENT-step slot masked
        out (it still holds the stale pos-cap row), and the new token's
        contribution is merged in-register at the stream's last block —
        numerically the same online softmax, different merge order;
      * the row write reuses the last live block ALREADY IN VMEM: copy it
        to a write buffer with the new row inserted, then DMA only the
        sublane-aligned `win`-slot window back to HBM (k_in/v_in are
        aliased to k_out/v_out — in place, like ops/ring.py).  Write DMAs
        double-buffer on stream parity so the block walk never stalls.

    The new-token K/V arrive PRE-CAST to the ring dtype, so fp8 rings see
    exactly the quantize-then-read numerics of the unfused path."""
    del k_in, v_in
    n_blocks = cap // block
    total = total_ref[0]

    def dmas(slot, b, j):
        bidx = jax.lax.rem(info_ref[b, 1] + j, n_blocks)
        start = pl.multiple_of(bidx * block, block)
        li = info_ref[b, 3]
        return (
            pltpu.make_async_copy(
                k_out.at[b, li, :, pl.ds(start, block), :], k_buf.at[slot],
                sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_out.at[b, li, :, pl.ds(start, block), :], v_buf.at[slot],
                sem.at[slot, 1],
            ),
            bidx,
        )

    def wdmas(par, b):
        """Write-back DMAs for stream b's aligned window (reconstructable,
        so completion can be awaited from a later iteration)."""
        ws = jax.lax.rem(info_ref[b, 0], cap)
        w0 = (ws // win) * win
        w0b = pl.multiple_of(w0 - (ws // block) * block, win)
        wli = info_ref[b, 3]
        return (
            pltpu.make_async_copy(
                kw_buf.at[par, :, pl.ds(w0b, win), :],
                k_out.at[b, wli, :, pl.ds(pl.multiple_of(w0, win), win), :],
                wsem.at[par, 0],
            ),
            pltpu.make_async_copy(
                vw_buf.at[par, :, pl.ds(w0b, win), :],
                v_out.at[b, wli, :, pl.ds(pl.multiple_of(w0, win), win), :],
                wsem.at[par, 1],
            ),
        )

    def nxt(b, j):
        wrap = (j + 1) >= info_ref[b, 2]
        return (
            jnp.where(wrap, jnp.minimum(b + 1, bsz - 1), b),
            jnp.where(wrap, 0, j + 1),
        )

    kd0, vd0, _ = dmas(0, 0, 0)
    kd0.start()
    vd0.start()

    def body(t, carry):
        b, j, m, l, acc = carry
        bn, jn = nxt(b, j)
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < total)
        def _():
            kd, vd, _ = dmas(1 - slot, bn, jn)
            kd.start()
            vd.start()

        kd, vd, bidx = dmas(slot, b, j)
        kd.wait()
        vd.wait()

        pos = info_ref[b, 0]
        wslot = jax.lax.rem(pos, cap)
        q = qg_ref[b].astype(jnp.float32) * (1.0 / math.sqrt(d))
        kb = k_buf[slot].astype(jnp.float32)
        vb = v_buf[slot].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                              # [KH, G, block]
        slots_i = bidx * block + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, block), 2
        )
        logical = pos - jax.lax.rem(pos - slots_i + cap * 2, cap)
        valid = ((logical >= 0) & (logical > pos - window)
                 & (logical <= pos) & (slots_i != wslot))
        scores = jnp.where(valid, scores, -jnp.inf)

        m_blk = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(scores - m_safe)
        p = jnp.where(valid, p, 0.0)
        scale_prev = jnp.exp(jnp.where(jnp.isfinite(m), m - m_safe, -jnp.inf))
        scale_prev = jnp.where(jnp.isfinite(m), scale_prev, 0.0)
        l_new = l * scale_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * scale_prev + jax.lax.dot_general(
            p, vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

        last = (j + 1) >= info_ref[b, 2]

        @pl.when(last)
        def _():
            # merge the new token in-register (its slot was masked above)
            kn = kn_ref[b].astype(jnp.float32)          # [KH, 1, D]
            vn = vn_ref[b].astype(jnp.float32)
            s_new = jnp.sum(q * kn, axis=-1, keepdims=True)   # [KH, G, 1]
            m_tot = jnp.maximum(m_new, s_new)
            sc = jnp.exp(jnp.where(jnp.isfinite(m_new), m_new - m_tot,
                                   -jnp.inf))
            sc = jnp.where(jnp.isfinite(m_new), sc, 0.0)
            p_new = jnp.exp(s_new - m_tot)
            l_tot = l_new * sc + p_new
            acc_tot = acc_new * sc + p_new * vn
            o_ref[pl.ds(b, 1)] = (acc_tot / jnp.maximum(l_tot, 1e-30))[None]

        # row write at the walked block that CONTAINS the write slot (the
        # first walked block when the live interval wraps inside it, i.e.
        # the full-ring steady state; the last otherwise): wait for the
        # write two streams back, rebuild the block with the new row, DMA
        # the aligned window home.  Each block is visited once and later
        # walked blocks never overlap this window, so ordering is safe.
        @pl.when(bidx == wslot // block)
        def _():
            par = jax.lax.rem(b, 2)

            @pl.when(b >= 2)
            def _():
                kw, vw = wdmas(par, b - 2)
                kw.wait()
                vw.wait()

            hit = jax.lax.broadcasted_iota(
                jnp.int32, (1, block, 1), 1
            ) == (wslot - bidx * block)
            kw_buf[par] = jnp.where(hit, kn_ref[b], k_buf[slot])
            vw_buf[par] = jnp.where(hit, vn_ref[b], v_buf[slot])
            kw, vw = wdmas(par, b)
            kw.start()
            vw.start()

        m2 = jnp.where(last, -jnp.inf, m_new)
        l2 = jnp.where(last, 0.0, l_new)
        acc2 = jnp.where(last, 0.0, acc_new)
        return bn, jn, m2, l2, acc2

    m0 = jnp.full((kh, g, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((kh, g, 1), jnp.float32)
    acc0 = jnp.zeros((kh, g, d), jnp.float32)
    jax.lax.fori_loop(
        0, total, body, (jnp.int32(0), jnp.int32(0), m0, l0, acc0)
    )
    for bb in range(max(0, bsz - 2), bsz):
        kw, vw = wdmas(bb % 2, jnp.int32(bb))
        kw.wait()
        vw.wait()


def _info(pos, li, cap: int, window: int, block: int):
    """Per-stream [4] int32: (pos, first ring block, n blocks, layer)."""
    n_blocks = cap // block
    valid = jnp.minimum(jnp.minimum(pos + 1, window), cap)
    lo_slot = jnp.mod(pos - valid + 1, cap)
    lo_block = lo_slot // block
    nb = (jnp.mod(lo_slot, block) + valid + block - 1) // block
    nb = jnp.minimum(nb, n_blocks)
    li = jnp.broadcast_to(jnp.asarray(li, jnp.int32), jnp.shape(pos))
    return jnp.stack([pos, lo_block, nb, li], axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("window", "block", "interpret", "out_dtype", "flat"),
)
def flash_decode_attention_batched(
    q: jax.Array,          # [B, H, D]
    k_all: jax.Array,      # [B, L, KH, cap, D] stacked ring caches
    v_all: jax.Array,
    li: jax.Array,         # scalar int32 layer index
    pos: jax.Array,        # [B] int32 per-stream positions
    *,
    window: int,
    block: int | None = None,
    interpret: bool | None = None,
    out_dtype=None,
    flat: bool | None = None,
):
    bsz, h, d = q.shape
    _, _, kh, cap, _ = k_all.shape
    g = h // kh
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block is None:
        # largest 128-multiple divisor of cap <= DEFAULT_BLOCK (caps are
        # 128-aligned but not necessarily powers of two, e.g. 896)
        block = min(DEFAULT_BLOCK, cap)
        while cap % block:
            block -= 128
            if block <= 0:
                block = cap
                break
    assert cap % block == 0, (cap, block)
    out_dtype = out_dtype or q.dtype
    if flat is None:
        # measured (docs/PERF.md round 3): the flat pipeline wins at
        # serving batch sizes; the per-stream grid only at B=1
        flat = bsz > 1

    info = _info(pos, li, cap, window, block)       # [B, 4]
    qg = q.reshape(bsz, kh, g, d)

    if flat:
        total = jnp.sum(info[:, 2]).reshape(1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((bsz, kh, g, d),
                             lambda i, info, total: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((bsz, kh, g, d),
                                   lambda i, info, total: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, kh, block, d), k_all.dtype),
                pltpu.VMEM((2, kh, block, d), v_all.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        out = pl.pallas_call(
            functools.partial(
                _kernel_flat, cap=cap, window=window, block=block,
                kh=kh, g=g, d=d, bsz=bsz,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bsz, kh, g, d), jnp.float32),
            interpret=interpret,
        )(info, total, qg, k_all, v_all)
        return out.reshape(bsz, h, d).astype(out_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, kh, g, d), lambda b, info: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, kh, g, d), lambda b, info: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, kh, block, d), k_all.dtype),
            pltpu.VMEM((2, kh, block, d), v_all.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, cap=cap, window=window, block=block, kh=kh, g=g, d=d
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, kh, g, d), jnp.float32),
        interpret=interpret,
    )(info, qg, k_all, v_all)
    return out.reshape(bsz, h, d).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("window", "block", "interpret", "out_dtype"),
)
def flash_decode_write_attention_batched(
    q: jax.Array,          # [B, H, D]
    k_all: jax.Array,      # [B, L, KH, cap, D] stacked ring caches
    v_all: jax.Array,
    k_rows: jax.Array,     # [B, KH, D] this step's new K rows
    v_rows: jax.Array,
    li: jax.Array,         # scalar int32 layer index
    pos: jax.Array,        # [B] int32 per-stream positions
    *,
    window: int,
    block: int | None = None,
    interpret: bool | None = None,
    out_dtype=None,
):
    """Fused row-write + attention: ONE Pallas launch per layer instead of
    ring_rows_write + flash_decode_attention_batched.  Returns
    (out [B, H, D], k_all, v_all) with the caches updated in place
    (input_output_aliased; callers donate)."""
    bsz, h, d = q.shape
    _, _, kh, cap, _ = k_all.shape
    g = h // kh
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block is None:
        block = min(DEFAULT_BLOCK, cap)
        while cap % block:
            block -= 128
            if block <= 0:
                block = cap
                break
    win = _write_win(k_all.dtype)
    assert cap % block == 0 and block % win == 0, (cap, block, win)
    out_dtype = out_dtype or q.dtype

    info = _info(pos, li, cap, window, block)       # [B, 4]
    total = jnp.sum(info[:, 2]).reshape(1)
    qg = q.reshape(bsz, kh, g, d)
    kn = k_rows.astype(k_all.dtype)[:, :, None, :]  # [B, KH, 1, D]
    vn = v_rows.astype(v_all.dtype)[:, :, None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((bsz, kh, g, d),
                         lambda i, info, total: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, kh, 1, d),
                         lambda i, info, total: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, kh, 1, d),
                         lambda i, info, total: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((bsz, kh, g, d),
                         lambda i, info, total: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, kh, block, d), k_all.dtype),
            pltpu.VMEM((2, kh, block, d), v_all.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((2, kh, block, d), k_all.dtype),
            pltpu.VMEM((2, kh, block, d), v_all.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out, k_all, v_all = pl.pallas_call(
        functools.partial(
            _kernel_flat_fused, cap=cap, window=window, block=block,
            kh=kh, g=g, d=d, bsz=bsz, win=win,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((bsz, kh, g, d), jnp.float32),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ),
        # operand indices count the 2 scalar-prefetch args
        input_output_aliases={5: 1, 6: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(info, total, qg, kn, vn, k_all, v_all)
    return out.reshape(bsz, h, d).astype(out_dtype), k_all, v_all


def _write_win(dtype) -> int:
    """Sublane-aligned RMW window (slots) for in-place ring writes —
    matches ops/ring.py: byte-wide storage packs 4 sublanes/word."""
    return 32 if jnp.dtype(dtype).itemsize < 2 else 16


@functools.lru_cache(maxsize=None)
def _single_write_fn(window: int, block, out_dtype_name):
    """Single-stream fused write+attention with a custom_vmap rule routing
    the batched serving path to the one-launch fused kernel.  Unbatched
    (the B=1 CLI path) it stays the proven two-launch pair."""
    from .ring import ring_rows_write

    @jax.custom_batching.custom_vmap
    def single(q, k_all, v_all, k_row, v_row, li, pos):
        k_all, v_all = ring_rows_write(k_all, v_all, k_row, v_row, li, pos)
        out = flash_decode_attention(
            q, k_all, v_all, li, pos, window=window, block=block,
            out_dtype=jnp.dtype(out_dtype_name) if out_dtype_name else None,
        )
        return out, k_all, v_all

    @single.def_vmap
    def _rule(axis_size, in_batched, q, k_all, v_all, k_row, v_row, li, pos):
        qb, kb, vb, krb, vrb, lib, pb = in_batched
        assert kb and vb, "caches must be batched over streams"
        bc = lambda x, batched: x if batched else jnp.broadcast_to(
            x, (axis_size,) + jnp.shape(x)
        )
        q = bc(q, qb)
        k_row = bc(k_row, krb)
        v_row = bc(v_row, vrb)
        pos = bc(pos, pb)
        li_s = li[0] if lib else li  # layer index is shared across streams
        out, k_all, v_all = flash_decode_write_attention_batched(
            q, k_all, v_all, k_row, v_row, li_s, pos,
            window=window, block=block,
            out_dtype=jnp.dtype(out_dtype_name) if out_dtype_name else None,
        )
        return (out, k_all, v_all), (True, True, True)

    return single


def flash_decode_write_attention(
    q: jax.Array,          # [H, D] query for ONE new position
    k_all: jax.Array,      # [L, KH, cap, D] stacked ring caches
    v_all: jax.Array,
    k_row: jax.Array,      # [KH, D] this position's K row (pre-RoPE applied)
    v_row: jax.Array,
    li: jax.Array,         # scalar int32: layer
    pos: jax.Array,        # scalar int32: this query's position
    *,
    window: int,
    block: int | None = None,
    out_dtype=None,
):
    """Write (k_row, v_row) at pos into layer li of the ring caches and
    return this position's attention output over the updated ring:
    (out [H, D], k_all, v_all).  vmap over streams fuses both into ONE
    Pallas launch per layer (the serving decode path)."""
    out_dtype_name = jnp.dtype(out_dtype).name if out_dtype else None
    fn = _single_write_fn(window, block, out_dtype_name)
    return fn(q, k_all, v_all, k_row, v_row,
              jnp.asarray(li, jnp.int32), jnp.asarray(pos, jnp.int32))


@functools.lru_cache(maxsize=None)
def _single_fn(window: int, block, out_dtype_name):
    """Single-stream callable with a custom_vmap rule routing the batched
    serving path (jax.vmap over streams) to the batched kernel."""

    @jax.custom_batching.custom_vmap
    def single(q, k_all, v_all, li, pos):
        out = flash_decode_attention_batched(
            q[None], k_all[None], v_all[None], li, pos[None],
            window=window, block=block,
            out_dtype=jnp.dtype(out_dtype_name) if out_dtype_name else None,
        )
        return out[0]

    @single.def_vmap
    def _rule(axis_size, in_batched, q, k_all, v_all, li, pos):
        qb, kb, vb, lib, pb = in_batched
        bc = lambda x, batched: x if batched else jax.tree.map(
            lambda a: jnp.broadcast_to(a, (axis_size,) + a.shape), x
        )
        q = bc(q, qb)
        k_all = bc(k_all, kb)
        v_all = bc(v_all, vb)
        pos = bc(pos, pb)
        li_s = li[0] if lib else li  # layer index is shared across streams
        out = flash_decode_attention_batched(
            q, k_all, v_all, li_s, pos, window=window, block=block,
            out_dtype=jnp.dtype(out_dtype_name) if out_dtype_name else None,
        )
        return out, True

    return single


def flash_decode_attention(
    q: jax.Array,          # [H, D] queries for ONE position
    k_all: jax.Array,      # [L, KH, cap, D] stacked ring caches
    v_all: jax.Array,
    li: jax.Array,         # scalar int32: layer to attend in
    pos: jax.Array,        # scalar int32: this query's (already written) pos
    *,
    window: int,
    block: int | None = None,
    interpret: bool | None = None,
    out_dtype=None,
):
    """Returns [H, D] attention output for the single query at `pos` over
    layer `li` of the stacked cache.  Pass the STACKED cache — slicing the
    layer outside would materialize a full ring copy per call (see module
    docstring).  vmap-compatible: batching over streams dispatches the
    (B,)-grid kernel via a custom_vmap rule."""
    del interpret  # auto-selected inside the batched entry
    out_dtype_name = jnp.dtype(out_dtype).name if out_dtype else None
    fn = _single_fn(window, block, out_dtype_name)
    return fn(q, k_all, v_all, jnp.asarray(li, jnp.int32),
              jnp.asarray(pos, jnp.int32))
