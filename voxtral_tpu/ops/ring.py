"""Ring-buffer KV cache + sliding-window GQA attention (XLA reference path).

The C reference keeps rolling KV caches it compacts with memmove when full
(voxtral_decoder.c:317-347, voxtral_encoder.c:388-406).  On TPU we replace
data movement with index arithmetic: a fixed-capacity ring where position p
lives in slot p % cap.  The logical position of slot s, given that the last
written position is p_end, is

    l(s) = p_end - ((p_end - s) mod cap)        (in (p_end - cap, p_end])

so the sliding-window causal mask for a query at position q is simply

    valid(s) = 0 <= l(s) <= q  and  l(s) > q - window.

No position bookkeeping array, no compaction, no copies.  RoPE is applied at
*logical* positions before the write, so cached K never needs re-rotation —
the same argument the reference makes at voxtral_decoder.c:313-316.

Ring layout is head-major [KH, cap, D]: the slot axis is contiguous per head,
which is what both the XLA attention einsum and the Pallas flash-decode
kernel (ops/flash_decode.py) want to stream from HBM.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def ring_write(ring: jax.Array, vals: jax.Array, pos0: jax.Array) -> jax.Array:
    """Write T rows into the ring at slots (pos0 .. pos0+T-1) mod cap.

    ring: [KH, cap, D]; vals: [T, KH, D]; pos0: scalar int32 (logical position
    of vals[0]).  Returns the updated ring.  T == 1 uses a
    dynamic_update_slice fast path; larger T uses a scatter with unique mod
    indices.
    """
    kh, cap, d = ring.shape
    t = vals.shape[0]
    vals = vals.astype(ring.dtype)
    vals_t = jnp.swapaxes(vals, 0, 1)  # [KH, T, D]
    def rotate(x, shift):  # left-rotate axis 1 by `shift`
        return jax.lax.dynamic_slice(
            jnp.concatenate([x, x], axis=1), (0, shift, 0), x.shape
        )

    if t == 1:
        slot = jnp.mod(pos0, cap)
        return jax.lax.dynamic_update_slice(ring, vals_t, (0, slot, 0))
    if t >= cap:
        # Only the last `cap` rows survive; row i lands at slot
        # (start + i) mod cap, i.e. a right-rotation by `start` — expressed
        # as the same concat+dynamic_slice rotate as the wraparound path
        # (dynamic-shift roll on cache-sized arrays stalls TPU compiles).
        vals_t = vals_t[:, t - cap :]
        start = jnp.mod(pos0 + (t - cap), cap)
        return rotate(vals_t, jnp.mod(cap - start, cap))
    # Bulk write with wraparound: rotate the ring so the write lands at slot
    # 0, update contiguously, rotate back.  Rotation by a dynamic amount is
    # expressed as concat + dynamic_slice (static shapes, no gather/scatter —
    # both of which compile pathologically on some TPU toolchains).
    # Measured on chip: a lax.cond fast path for the non-wrapping case is
    # SLOWER (34.1 vs 21.6 ms per 1024-frame encode chunk) — cond
    # materializes the ring operand instead of fusing, costing more than the
    # ~7% rotate traffic it saves.  Keep the unconditional rotate.
    start = jnp.mod(pos0, cap)

    rolled = rotate(ring, start)
    rolled = jax.lax.dynamic_update_slice(rolled, vals_t, (0, 0, 0))
    return rotate(rolled, jnp.mod(cap - start, cap))


# KV-row DMA window: a single slot is below the sublane tiling granularity
# (Mosaic: "slice along dim must be aligned to tiling (8)"), so the kernel
# read-modify-writes an aligned window of slots around the target row.
# bf16/f32 need 16; byte-wide (fp8) storage packs 4 sublanes/word -> 32.


def _win(dtype) -> int:
    return 32 if jnp.dtype(dtype).itemsize < 2 else 16


def _rows_write_kernel(info_ref, k_vals, v_vals, k_in, v_in, k_out, v_out,
                       kbuf, vbuf, sem, *, win):
    # grid (B,): read the aligned window containing this stream's slot,
    # overwrite the one row in VMEM, DMA it back — in place (k_in/v_in are
    # aliased to k_out/v_out).
    del k_in, v_in
    b = pl.program_id(0)
    s = info_ref[b, 0]
    li = info_ref[b, 1]
    s0 = (s // win) * win
    off = s - s0

    rk = pltpu.make_async_copy(
        k_out.at[b, li, :, pl.ds(s0, win), :], kbuf, sem.at[0]
    )
    rv = pltpu.make_async_copy(
        v_out.at[b, li, :, pl.ds(s0, win), :], vbuf, sem.at[1]
    )
    rk.start()
    rv.start()
    rk.wait()
    rv.wait()

    hit = jax.lax.broadcasted_iota(jnp.int32, (1, win, 1), 1) == off
    kbuf[:] = jnp.where(hit, k_vals[0], kbuf[:])
    vbuf[:] = jnp.where(hit, v_vals[0], vbuf[:])

    wk = pltpu.make_async_copy(
        kbuf, k_out.at[b, li, :, pl.ds(s0, win), :], sem.at[0]
    )
    wv = pltpu.make_async_copy(
        vbuf, v_out.at[b, li, :, pl.ds(s0, win), :], sem.at[1]
    )
    wk.start()
    wv.start()
    wk.wait()
    wv.wait()


def _rows_write_batched(k_all, v_all, k_rows, v_rows, li, pos):
    """k_all/v_all [B, L, KH, cap, D]; k_rows/v_rows [B, KH, D]; li scalar,
    pos [B].  One Pallas launch writes every stream's row in place."""
    bsz, n_layers, kh, cap, d = k_all.shape
    win = _win(k_all.dtype)
    assert cap % win == 0, (cap, win)
    slots = jnp.mod(pos, cap).astype(jnp.int32)
    info = jnp.stack(
        [slots, jnp.broadcast_to(jnp.int32(li), slots.shape)], axis=-1
    )                                                   # [B, 2]
    kv4 = k_rows.astype(k_all.dtype)[:, :, None, :]     # [B, KH, 1, D]
    vv4 = v_rows.astype(v_all.dtype)[:, :, None, :]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, kh, 1, d), lambda b, info: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, 1, d), lambda b, info: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((kh, win, d), k_all.dtype),
            pltpu.VMEM((kh, win, d), v_all.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        partial(_rows_write_kernel, win=win),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ),
        # operand indices COUNT the scalar-prefetch arg (cf. megablox gmm)
        input_output_aliases={3: 0, 4: 1},
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(info, kv4, vv4, k_all, v_all)


@jax.custom_batching.custom_vmap
def ring_rows_write(k_all, v_all, k_row, v_row, li, pos):
    """Write one position's K/V rows into the stacked [L, KH, cap, D] caches
    at (li, :, pos % cap, :).

    Single stream: two dynamic_update_slices (what the reference's
    kv_cache_copy kernel does, voxtral_shaders.metal:260-272).  Batched over
    streams (jax.vmap in the serving path), XLA lowers vmapped dus with
    per-stream indices to a B-iteration while loop — profiled at ~3.6 ms per
    B=16 decode step, the single biggest non-weight cost — so a custom_vmap
    rule routes it to ONE Pallas launch that DMAs all B rows in place.

    k_row/v_row: [KH, D]; li, pos: scalar int32.
    """
    cap = k_all.shape[2]
    slot = jnp.mod(pos, cap)
    kt = k_row.astype(k_all.dtype)[None, :, None, :]    # [1, KH, 1, D]
    vt = v_row.astype(v_all.dtype)[None, :, None, :]
    k_all = jax.lax.dynamic_update_slice(k_all, kt, (li, 0, slot, 0))
    v_all = jax.lax.dynamic_update_slice(v_all, vt, (li, 0, slot, 0))
    return k_all, v_all


@ring_rows_write.def_vmap
def _ring_rows_write_vmap(axis_size, in_batched, k_all, v_all, k_row, v_row,
                          li, pos):
    kb, vb, krb, vrb, lib, pb = in_batched
    assert kb and vb, "caches must be batched over streams"

    def bc(x, batched):
        return x if batched else jnp.broadcast_to(x, (axis_size,) + jnp.shape(x))

    k_row = bc(k_row, krb)
    v_row = bc(v_row, vrb)
    pos = bc(pos, pb)
    li_s = li if not lib else li[0]  # layer index is shared across streams
    k_all, v_all = _rows_write_batched(k_all, v_all, k_row, v_row, li_s, pos)
    return (k_all, v_all), (True, True)


# ---------------------------------------------------------------------------
# Batched multi-row (chunk) ring write
# ---------------------------------------------------------------------------
#
# The encoder writes T~20-150 rows per chunk into every layer's ring.  The
# unbatched rotate-based ring_write is fine single-stream, but under stream
# vmap its concat+dynamic_slice rotate has a PER-STREAM shift, which XLA
# lowers to a gather over the whole cache -- measured as ~210 ms of a 289 ms
# 16-stream pool tick (docs/PERF.md round 5, tools/tick_probe.py).
#
# The batched path below is a one-hot MXU matmul blend: for each cache slot
# c, the chunk row that lands there is j(c) = (c - slot0) mod cap, so
#
#     upd  = P @ chunk        P[b, c, j] = (j(c) == j) & (j(c) < T)
#     ring = where(j(c) < T, upd, ring)
#
# All streaming traffic + one tiny batched matmul (P is [B, cap, T] of
# zeros/ones; exact: each output row is a single chunk row, accumulated in
# f32).  No per-stream gather over the cache, no scatter, no dynamic shift.
# Measured on chip at the pool-tick shapes (B=16, L=32, KH=32, cap=896,
# T=24, both caches): 61 ms vs 168 ms for the vmapped rotate.  A Pallas
# in-place variant (aligned DMA read-modify-write windows) was built and
# measured WORSE (~29 ms/launch = 930 ms/tick): `input_output_aliases` does
# not survive the [cap, 64] -> [cap/2, 128] reshape Mosaic's 128-lane rule
# forces, so every launch copied the whole cache (docs/PERF.md round 5).


def _blend_write(ring, chunk, slot):
    """Batched chunk write into one layer's rings, no gather/scatter.

    ring: [B, KH, cap, D]; chunk: [B, T, KH, D] (T <= cap); slot: [B] int32
    in [0, cap).  Row i of each stream's chunk lands at slot (slot+i) % cap.
    Exact for every KV dtype: the one-hot matmul runs in a >=16-bit compute
    dtype with f32 accumulation (fp8 values round-trip bf16 exactly).
    """
    bsz, kh, cap, d = ring.shape
    t = chunk.shape[1]
    cdt = ring.dtype if ring.dtype.itemsize >= 2 else jnp.bfloat16
    j = jnp.mod(jnp.arange(cap, dtype=jnp.int32)[None, :] - slot[:, None],
                cap)                                          # [B, cap]
    hit = j < t
    p = (j[:, :, None] == jnp.arange(t, dtype=jnp.int32)[None, None, :])
    p = jnp.where(hit[:, :, None], p, False).astype(cdt)      # [B, cap, T]
    c2 = chunk.astype(cdt).reshape(bsz, t, kh * d)
    upd = jax.lax.dot_general(
        p, c2, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(ring.dtype)
    upd = jnp.swapaxes(upd.reshape(bsz, cap, kh, d), 1, 2)
    return jnp.where(hit[:, None, :, None], upd, ring)


def _chunk_write_single(k_all, v_all, k_chunk, v_chunk, li, pos0):
    """Unbatched chunk write: slice + rotate-based ring_write + write-back
    (the pre-existing encoder path; the returned rings are real buffers,
    safe to feed the Pallas flash-encode kernel)."""
    k_ring = jax.lax.dynamic_index_in_dim(k_all, li, axis=0, keepdims=False)
    v_ring = jax.lax.dynamic_index_in_dim(v_all, li, axis=0, keepdims=False)
    k_ring = ring_write(k_ring, k_chunk, pos0)
    v_ring = ring_write(v_ring, v_chunk, pos0)
    k_all = jax.lax.dynamic_update_index_in_dim(k_all, k_ring, li, axis=0)
    v_all = jax.lax.dynamic_update_index_in_dim(v_all, v_ring, li, axis=0)
    return k_all, v_all, k_ring, v_ring


@jax.custom_batching.custom_vmap
def ring_chunk_write(k_all, v_all, k_chunk, v_chunk, li, pos0):
    """Write a T-row chunk into layer li of the stacked [L, KH, cap, D]
    caches at slots (pos0 .. pos0+T-1) mod cap.

    Returns (k_all, v_all, k_ring, v_ring) where k_ring/v_ring are the
    updated layer's rings [KH, cap, D] (what attention reads next).
    Single stream: the rotate-based ring_write.  Batched over streams: the
    one-hot matmul blend -- the vmapped rotate's per-stream shift otherwise
    lowers to a whole-cache gather (~210 ms of a 289 ms 16-stream pool
    tick, docs/PERF.md round 5 / tools/tick_probe.py).

    k_chunk/v_chunk: [T, KH, D]; li, pos0: scalar int32.
    """
    return _chunk_write_single(k_all, v_all, k_chunk, v_chunk, li, pos0)


@ring_chunk_write.def_vmap
def _ring_chunk_write_vmap(axis_size, in_batched, k_all, v_all, k_chunk,
                           v_chunk, li, pos0):
    kb, vb, kcb, vcb, lib, pb = in_batched
    assert kb and vb, "caches must be batched over streams"

    def bc(x, batched):
        return x if batched else jnp.broadcast_to(
            x, (axis_size,) + jnp.shape(x))

    k_chunk = bc(k_chunk, kcb)
    v_chunk = bc(v_chunk, vcb)
    pos0 = bc(pos0, pb)
    li_s = li if not lib else li[0]  # layer index is shared across streams
    cap = k_all.shape[3]
    t = k_chunk.shape[1]

    if t > cap:
        # whole-ring rewrite (only the last cap rows survive) -- the rotate
        # path's t >= cap branch handles the survivor arithmetic
        k_all, v_all, k_ring, v_ring = jax.vmap(
            _chunk_write_single, in_axes=(0, 0, 0, 0, None, 0)
        )(k_all, v_all, k_chunk, v_chunk, li_s, pos0)
        return (k_all, v_all, k_ring, v_ring), (True, True, True, True)

    slot = jnp.mod(pos0, cap).astype(jnp.int32)
    k_ring = _blend_write(
        jax.lax.dynamic_index_in_dim(k_all, li_s, axis=1, keepdims=False),
        k_chunk, slot)
    v_ring = _blend_write(
        jax.lax.dynamic_index_in_dim(v_all, li_s, axis=1, keepdims=False),
        v_chunk, slot)
    # shared-index write-back (NOT a scatter: li is unbatched)
    k_all = jax.lax.dynamic_update_index_in_dim(k_all, k_ring, li_s, axis=1)
    v_all = jax.lax.dynamic_update_index_in_dim(v_all, v_ring, li_s, axis=1)
    return (k_all, v_all, k_ring, v_ring), (True, True, True, True)


def slot_logical_positions(p_end: jax.Array, cap: int) -> jax.Array:
    """Logical position currently held by each slot (int32 [cap])."""
    slots = jnp.arange(cap, dtype=jnp.int32)
    return p_end - jnp.mod(p_end - slots, cap)


@partial(jax.jit, static_argnames=("window", "out_dtype"))
def ring_attention(
    q: jax.Array,
    k_ring: jax.Array,
    v_ring: jax.Array,
    q_pos0: jax.Array,
    *,
    window: int,
    out_dtype=None,
) -> jax.Array:
    """Sliding-window causal GQA attention over a ring cache.

    q:       [T, H, D]   queries at logical positions q_pos0 .. q_pos0+T-1
    k_ring:  [KH, cap, D]  (K/V for those T positions must already be written)
    v_ring:  [KH, cap, D]
    Returns: [T, H, D] in out_dtype (default q.dtype).

    Numerics: scores and softmax in float32 (matching the f32 SDPA island in
    python_simple_implementation.py:313-318); the PV matmul accumulates f32.
    """
    t, h, d = q.shape
    kh, cap, _ = k_ring.shape
    g = h // kh
    out_dtype = out_dtype or q.dtype
    scale = 1.0 / math.sqrt(d)

    p_end = q_pos0 + (t - 1)
    l = slot_logical_positions(p_end, cap)                    # [cap]
    q_pos = q_pos0 + jnp.arange(t, dtype=jnp.int32)           # [T]
    valid = (
        (l[None, :] >= 0)
        & (l[None, :] <= q_pos[:, None])
        & (l[None, :] > q_pos[:, None] - window)
    )                                                          # [T, cap]

    qg = q.reshape(t, kh, g, d)
    # Matmul dtype: the cache dtype when it is a matmul-native float (the
    # reference Metal f16 path), else the query compute dtype for byte-wide
    # (fp8) KV storage — XLA fuses the widening convert into the ring read,
    # so HBM traffic stays at the storage width (the point of fp8 KV).
    mm_dtype = k_ring.dtype if k_ring.dtype.itemsize >= 2 else q.dtype
    # scores: [KH, G, T, cap]
    scores = jnp.einsum(
        "tkgd,ksd->kgts", qg.astype(mm_dtype), k_ring.astype(mm_dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    scores = jnp.where(valid[None, None, :, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    # PV matmul with f32 accumulation: casting the probs down (bf16, not
    # f32) avoids materializing an f32 copy of the V ring every step.
    out = jnp.einsum(
        "kgts,ksd->tkgd", probs.astype(mm_dtype), v_ring.astype(mm_dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(t, h, d).astype(out_dtype)
