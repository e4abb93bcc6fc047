"""Pallas TPU banded attention for the NO-RING bulk (offline) encoder.

The reference keeps two encoder execution modes: the incremental ring path
for streaming and a ~5x faster batch path for offline clips
(vox_encoder_forward, voxtral_encoder.c:135-312).  This kernel is the batch
path's attention: positions are simply 0..T-1 (no ring, no logical-position
state), so the sliding-window causal structure is a static BAND — each query
tile only ever needs the k/v blocks covering [q - window + 1, q].

Why a kernel at all: the XLA incremental path materializes the [KH, T, cap]
f32 score tensor in HBM every layer (~84 MB x 32 layers x r/w per 1024-frame
chunk — measured as 40% of int4-mode serving wall, docs/PERF.md).  Here the
grid walks only the band blocks and scores never leave VMEM.

Structure (the canonical TPU flash-attention shape, cf. jax.experimental
pallas ops): grid (B, q_tiles, band_blocks) with m/l/acc VMEM scratch
accumulated across the band dimension, initialized at j==0 and emitted at
j==n_band-1.  The k-block index map clamps out-of-range band blocks to the
last block; masking uses the UNCLAMPED logical block index, so clamped
(duplicate) loads contribute nothing.

Unlike ops/flash_encode.py (the ring variant, whose failure mode at the
full-size shape is whole-ring VMEM blocks), blocks here are [KH, BK, D]
slices along the position axis — sublane-dim slicing at tile-aligned
multiples, which Mosaic accepts for any head_dim.

Trailing zero-padding of the position axis needs NO explicit masking: padded
k positions sit strictly after every valid query, so the causal term kills
them; padded q rows compute garbage that callers slice away.  LEADING
invalid positions (the window-recompute streaming mode, where a stream's
context has not yet filled the window buffer) are masked by the per-stream
`kv_lo` scalar: k positions below it are invisible.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# defaults chosen by on-chip sweep (docs/PERF.md); env-overridable for A/Bs
DEFAULT_BLOCK_Q = int(os.environ.get("BANDED_BQ", "256"))
DEFAULT_BLOCK_K = int(os.environ.get("BANDED_BK", "256"))


def _round_up(n: int, to: int) -> int:
    return -(-n // to) * to


def _kernel(lo_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
            window: int, bq: int, bk: int, kh: int, g: int, d: int,
            n_band: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        # finite sentinel: a fully-masked FIRST block then yields p == 1
        # garbage, but the first block with a real score rescales acc and l
        # by corr == exp(-1e30 - m) == 0, discarding it exactly
        m_ref[:] = jnp.full(m_ref.shape, -1e30, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    # logical (unclamped) k block for this band step; the index map loads a
    # clamped block, but positions below use the logical index so that
    # out-of-range steps are fully masked
    f_i = jnp.maximum(i * bq - (window - 1), 0) // bk
    kb = f_i + j

    # skip steps whose whole block is after the tile's last query (early
    # tiles have a clamped band start, so their trailing steps are dead)
    @pl.when(kb * bk <= i * bq + bq - 1)
    def _step():
        q = q_ref[0, 0]                   # [KH, BQ*G, D] compute dtype
        kblk = k_ref[0]                   # [KH, BK, D]
        vblk = v_ref[0]
        scale = jnp.float32(1.0 / math.sqrt(d))

        scores = jax.lax.dot_general(
            q, kblk, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                         # [KH, BQ*G, BK]

        # row r of the tile is query (i*bq + r//g); column c is kb*bk + c
        q_pos = i * bq + jax.lax.broadcasted_iota(
            jnp.int32, (1, bq * g, 1), 1
        ) // g
        k_pos = kb * bk + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bk), 2)
        valid = (
            (k_pos <= q_pos) & (k_pos > q_pos - window)
            & (k_pos >= lo_ref[b])
        )
        # finite sentinel (not -inf): m stays finite, so the update needs no
        # isfinite bookkeeping; rows with zero valid columns divide by the
        # l floor at emit time and are garbage by construction
        scores = jnp.where(valid, scores, -1e30)

        m_prev = m_ref[:]                 # [KH, BQ*G, 1]
        l_prev = l_ref[:]
        m_blk = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_blk)
        p = jnp.exp(scores - m_new)       # masked cols underflow to 0
        corr = jnp.exp(m_prev - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
            p.astype(q.dtype), vblk, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new
        l_ref[:] = l_new

    @pl.when(j == n_band - 1)
    def _emit():
        o_ref[0, 0] = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)


@functools.partial(
    jax.jit,
    static_argnames=("window", "block_q", "block_k", "interpret", "out_dtype"),
)
def banded_attention_batched(
    q: jax.Array,          # [B, T, H, D] queries at positions 0..T-1
    k: jax.Array,          # [B, T, KH, D]
    v: jax.Array,
    kv_lo: jax.Array | None = None,   # [B] i32: first VISIBLE k position
    *,
    window: int,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool | None = None,
    out_dtype=None,
):
    """Sliding-window causal attention over positions 0..T-1 (no ring).
    Returns [B, T, H, D]."""
    bsz, t, h, d = q.shape
    kh = k.shape[2]
    g = h // kh
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_dtype = out_dtype or q.dtype
    if kv_lo is None:
        kv_lo = jnp.zeros((bsz,), jnp.int32)
    bk = block_k or min(DEFAULT_BLOCK_K, _round_up(t, 128))
    t_pad = _round_up(t, bk)
    # bq: largest multiple of 8 <= the requested size that divides t_pad
    bq = min(block_q or DEFAULT_BLOCK_Q, t_pad)
    while t_pad % bq:
        bq -= 8
    if t_pad != t:
        # trailing padding is masked by causality alone (module docstring)
        q = jnp.pad(q, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
    n_i = t_pad // bq
    n_k = t_pad // bk
    # band blocks per q tile: the window behind the tile plus the tile itself
    n_band = (bq + window - 2) // bk + 2

    # heads-major tiles: [B, nI, KH, BQ*G, D]
    q5 = (
        q.reshape(bsz, n_i, bq, kh, g, d)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(bsz, n_i, kh, bq * g, d)
    )
    k3 = jnp.swapaxes(k, 1, 2)            # [B, KH, T_pad, D]
    v3 = jnp.swapaxes(v, 1, 2)

    def k_index(b, i, j, lo):
        f_i = jnp.maximum(i * bq - (window - 1), 0) // bk
        return (b, 0, jnp.minimum(f_i + j, n_k - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, n_i, n_band),
        in_specs=[
            pl.BlockSpec((1, 1, kh, bq * g, d),
                         lambda b, i, j, lo: (b, i, 0, 0, 0)),
            pl.BlockSpec((1, kh, bk, d), k_index),
            pl.BlockSpec((1, kh, bk, d), k_index),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, kh, bq * g, d), lambda b, i, j, lo: (b, i, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((kh, bq * g, 1), jnp.float32),
            pltpu.VMEM((kh, bq * g, 1), jnp.float32),
            pltpu.VMEM((kh, bq * g, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, window=window, bq=bq, bk=bk, kh=kh, g=g, d=d,
            n_band=n_band,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, n_i, kh, bq * g, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # blocks + double-buffering + f32 m/l/acc scratch exceed the
            # 16 MB default scoped-vmem limit at the full-size shape
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv_lo.astype(jnp.int32), q5, k3, v3)
    out = (
        out.reshape(bsz, n_i, kh, bq, g, d)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(bsz, t_pad, h, d)[:, :t]
    )
    return out.astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _single_fn(window: int, block_q, block_k, out_dtype_name):
    """Single-stream entry whose custom_vmap rule routes jax.vmap (the
    batched offline-encode path) to one batched kernel launch."""

    def call(q, k, v, kv_lo):
        return banded_attention_batched(
            q, k, v, kv_lo, window=window, block_q=block_q, block_k=block_k,
            out_dtype=jnp.dtype(out_dtype_name) if out_dtype_name else None,
        )

    @jax.custom_batching.custom_vmap
    def single(q, k, v, kv_lo):
        return call(q[None], k[None], v[None], kv_lo[None])[0]

    @single.def_vmap
    def _rule(axis_size, in_batched, q, k, v, kv_lo):
        qb, kb, vb, lb = in_batched
        bc = lambda x, batched: x if batched else jnp.broadcast_to(
            x, (axis_size,) + jnp.shape(x)
        )
        return call(bc(q, qb), bc(k, kb), bc(v, vb), bc(kv_lo, lb)), True

    return single


def banded_attention(
    q: jax.Array,          # [T, H, D]
    k: jax.Array,          # [T, KH, D]
    v: jax.Array,
    kv_lo: jax.Array | None = None,   # scalar i32 (default 0)
    *,
    window: int,
    block_q: int | None = None,
    block_k: int | None = None,
    out_dtype=None,
):
    """[T, H, D] sliding-window causal attention at positions 0..T-1.
    vmap-compatible (custom_vmap -> one batched launch)."""
    out_dtype_name = jnp.dtype(out_dtype).name if out_dtype else None
    fn = _single_fn(window, block_q, block_k, out_dtype_name)
    if kv_lo is None:
        kv_lo = jnp.int32(0)
    return fn(q, k, v, jnp.asarray(kv_lo, jnp.int32))
