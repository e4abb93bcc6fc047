"""Pallas TPU int4 matmul: nibble-packed weights, unpack in VMEM.

The XLA int4 path (models/quant.py `_mm4`) reads nibble-packed int8 weights
but XLA materializes the shift-chain unpack as a separate fusion, so HBM
traffic degrades to >= 1 B/element and int4 loses to int8 (measured
9.19 vs 8.78 ms/step at B=16 — docs/PERF.md).  This kernel is the fix: the
packed [out_tile, in/2] tile is DMA'd to VMEM (0.5 B/element — the ONLY HBM
read of the weight), the two nibble halves are sign-extended in-register,
and both MXU dots + the per-half row-scale epilogue happen on chip.

Conventions shared with ops/flash_decode.py:
  * The kernel takes the STACKED [L, out, in/2] weight plus a layer index
    (scalar-prefetch) and block-indexes the layer inside the grid spec —
    feeding it a pre-sliced `p_all[li]` would materialize the gathered
    layer as a real operand buffer.
  * A custom_vmap rule routes `jax.vmap` (the batched serving path) to the
    same kernel with the stream axis folded into the row axis of x —
    weights are read ONCE per step regardless of batch.

Packing layout (models/quant.py `_quantize4`): low nibbles hold input
columns [0, in/2), high nibbles [in/2, in); one f32 scale per
(output row, half).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# output rows per grid instance: p tile [256, in/2] int8 + two unpacked
# bf16 halves stay well under the VMEM budget for every matrix in the model
DEFAULT_OUT_TILE = 256

# activation rows per grid instance: decode steps have B*T <= ~128 rows
# (one tile), but batched PREFILL folds B*38 rows — an untiled x block
# ([1216, 9216] bf16 = 21 MB) blows the 16 MB VMEM scoped limit
DEFAULT_ROW_TILE = 256


def _kernel(li_ref, x_ref, p_ref, s_ref, o_ref, *, half: int):
    del li_ref  # only used by the BlockSpec index maps
    # unpack in int32: Mosaic does not legalize shifts on int8 vectors
    # (arith.shli on i8 fails to compile)
    p = p_ref[0].astype(jnp.int32)                 # [OT, half]
    lo = jnp.right_shift(jnp.left_shift(p, 28), 28)  # sign-extend bits 0-3
    hi = jnp.right_shift(p, 4)                       # arithmetic: signed hi
    x = x_ref[...]                                 # [T, in] cdtype
    y_lo = jax.lax.dot_general(
        x[:, :half], lo.astype(x.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [T, OT]
    y_hi = jax.lax.dot_general(
        x[:, half:], hi.astype(x.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s_ref[0]                                   # [OT, 2] f32
    o_ref[...] = y_lo * s[:, 0][None, :] + y_hi * s[:, 1][None, :]


@functools.partial(
    jax.jit, static_argnames=("out_tile", "interpret")
)
def int4_mm_stacked(
    x: jax.Array,        # [T, in] compute-dtype activations
    p_all: jax.Array,    # [L, out, in/2] nibble-packed int8 weights
    s_all: jax.Array,    # [L, out, 2] f32 per-half scales
    li: jax.Array,       # scalar int32 layer index
    *,
    out_tile: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """f32 [T, out] = x @ unpack(p_all[li]).T * scales, weights read at
    0.5 B/element.  Pass the STACKED weight + layer index (see module
    docstring); for unstacked weights (logits table) pass p[None] with
    li=0 — the reshape is free."""
    t, in_dim = x.shape
    n_layers, out_dim, half = p_all.shape
    assert in_dim == 2 * half, (in_dim, half)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ot = out_tile or min(DEFAULT_OUT_TILE, out_dim)
    while out_dim % ot:   # tiny test configs: largest divisor <= the tile
        ot -= 1
    rt = min(DEFAULT_ROW_TILE, t)
    pad = (-t) % rt
    if pad:  # prefill row counts are arbitrary; pad to a whole tile
        x = jnp.pad(x, ((0, pad), (0, 0)))
    t_p = t + pad

    li = jnp.asarray(li, jnp.int32).reshape(1)
    # o is the minor grid dim: per row tile, x stays resident while the
    # packed tiles stream through
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_p // rt, out_dim // ot),
        in_specs=[
            pl.BlockSpec((rt, in_dim), lambda r, o, li: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ot, half), lambda r, o, li: (li[0], o, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ot, 2), lambda r, o, li: (li[0], o, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, ot), lambda r, o, li: (r, o),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, half=half),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_p, out_dim), jnp.float32),
        interpret=interpret,
        # the i32 unpack intermediates put the worst tile (w2: in 9216)
        # near the 16 MB default scoped-vmem limit; give Mosaic headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(li, x, p_all, s_all)
    return out[:t] if pad else out


@functools.lru_cache(maxsize=None)
def _single_fn(out_tile):
    """Entry with a custom_vmap rule: the batched serving path folds the
    stream axis into the row axis, so weights stream from HBM once per
    step for ALL streams."""

    @jax.custom_batching.custom_vmap
    def single(x, p_all, s_all, li):
        return int4_mm_stacked(x, p_all, s_all, li, out_tile=out_tile)

    @single.def_vmap
    def _rule(axis_size, in_batched, x, p_all, s_all, li):
        xb, pb, sb, lib = in_batched
        assert not (pb or sb), "weights must be shared across streams"
        if not xb:
            x = jnp.broadcast_to(x, (axis_size,) + x.shape)
        li_s = li[0] if lib else li  # layer index shared across streams
        b, t, in_dim = x.shape
        y = int4_mm_stacked(
            x.reshape(b * t, in_dim), p_all, s_all, li_s, out_tile=out_tile
        )
        return y.reshape(b, t, -1), True

    return single


def int4_mm(x, p_all, s_all, li, *, out_tile: int | None = None):
    """vmap-compatible wrapper around `int4_mm_stacked` (see its docstring).
    Under jax.vmap over streams, one kernel launch serves the whole batch."""
    fn = _single_fn(out_tile)
    return fn(x, p_all, s_all, jnp.asarray(li, jnp.int32))
