"""Pallas flash-decode kernel vs the XLA ring attention (interpret mode).

The kernel consumes the STACKED [L, KH, cap, D] cache + a layer index (it
slices the layer inside its DMAs); tests stack small rings and pick layers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxtral_tpu.ops.flash_decode import flash_decode_attention
from voxtral_tpu.ops.ring import ring_attention, ring_write


def _filled_ring(rng, kh, cap, d, pos):
    k_ring = jnp.zeros((kh, cap, d), jnp.float32)
    v_ring = jnp.zeros((kh, cap, d), jnp.float32)
    for p in range(pos + 1):
        kv = rng.standard_normal((1, kh, d)).astype(np.float32)
        vv = rng.standard_normal((1, kh, d)).astype(np.float32)
        k_ring = ring_write(k_ring, jnp.asarray(kv), jnp.int32(p))
        v_ring = ring_write(v_ring, jnp.asarray(vv), jnp.int32(p))
    return k_ring, v_ring


def _stack(*rings):
    return jnp.stack(rings)


@pytest.mark.parametrize("pos", [0, 3, 15, 16, 40, 63, 64, 100, 200])
def test_flash_decode_matches_ring(pos):
    rng = np.random.default_rng(pos)
    cap, window, block = 64, 48, 16
    kh, g, d = 2, 4, 8
    h = kh * g

    k0, v0 = _filled_ring(rng, kh, cap, d, pos)
    k1, v1 = _filled_ring(rng, kh, cap, d, max(pos // 2, 0))
    k_all, v_all = _stack(k1, k0), _stack(v1, v0)   # target layer = 1

    q = rng.standard_normal((h, d)).astype(np.float32)
    ref = np.asarray(
        ring_attention(jnp.asarray(q)[None], k0, v0, jnp.int32(pos),
                       window=window)
    )[0]
    got = np.asarray(
        flash_decode_attention(
            jnp.asarray(q), k_all, v_all, jnp.int32(1), jnp.int32(pos),
            window=window, block=block, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_flash_decode_small_cap():
    """cap < window (serving config): attention is limited by the ring."""
    rng = np.random.default_rng(7)
    cap, window, block = 32, 48, 8
    kh, g, d = 1, 2, 8
    h = kh * g
    pos = 50
    k0, v0 = _filled_ring(rng, kh, cap, d, pos)
    q = rng.standard_normal((h, d)).astype(np.float32)
    ref = np.asarray(
        ring_attention(jnp.asarray(q)[None], k0, v0, jnp.int32(pos),
                       window=window)
    )[0]
    got = np.asarray(
        flash_decode_attention(
            jnp.asarray(q), k0[None], v0[None], jnp.int32(0), jnp.int32(pos),
            window=window, block=block, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_flash_batched_matches_per_stream():
    """The (B,)-grid kernel with per-stream positions == per-stream calls."""
    from voxtral_tpu.ops.flash_decode import flash_decode_attention_batched

    rng = np.random.default_rng(11)
    bsz, n_layers, kh, g, d = 3, 2, 2, 4, 8
    cap, window, block = 64, 48, 16
    h = kh * g
    ks = jnp.asarray(
        rng.standard_normal((bsz, n_layers, kh, cap, d)), jnp.float32
    )
    vs = jnp.asarray(
        rng.standard_normal((bsz, n_layers, kh, cap, d)), jnp.float32
    )
    qs = jnp.asarray(rng.standard_normal((bsz, h, d)), jnp.float32)
    pos = jnp.asarray([5, 40, 200], jnp.int32)

    got = np.asarray(flash_decode_attention_batched(
        qs, ks, vs, jnp.int32(1), pos, window=window, block=block,
        interpret=True,
    ))
    for b in range(bsz):
        ref = np.asarray(flash_decode_attention(
            qs[b], ks[b], vs[b], jnp.int32(1), pos[b],
            window=window, block=block,
        ))
        np.testing.assert_allclose(got[b], ref, atol=1e-5, rtol=1e-5)


def test_flash_flat_matches_grid_kernel():
    """The single-instance flat-pipeline kernel == the (B,)-grid kernel for
    ragged per-stream positions (incl. ring-wrap and near-empty fills)."""
    from voxtral_tpu.ops.flash_decode import flash_decode_attention_batched

    rng = np.random.default_rng(23)
    bsz, n_layers, kh, g, d = 5, 2, 2, 4, 8
    cap, window, block = 64, 48, 16
    h = kh * g
    ks = jnp.asarray(
        rng.standard_normal((bsz, n_layers, kh, cap, d)), jnp.float32
    )
    vs = jnp.asarray(
        rng.standard_normal((bsz, n_layers, kh, cap, d)), jnp.float32
    )
    qs = jnp.asarray(rng.standard_normal((bsz, h, d)), jnp.float32)
    pos = jnp.asarray([0, 5, 47, 63, 200], jnp.int32)

    kw = dict(window=window, block=block, interpret=True)
    got = np.asarray(flash_decode_attention_batched(
        qs, ks, vs, jnp.int32(0), pos, flat=True, **kw
    ))
    ref = np.asarray(flash_decode_attention_batched(
        qs, ks, vs, jnp.int32(0), pos, flat=False, **kw
    ))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("flat", [False, True])
def test_flash_fp8_ring_matches_widened(flat):
    """fp8 rings flash too (int4 serving mode): the kernel DMAs fp8 blocks
    and widens in VMEM, so it must equal flash over the exactly-widened f32
    ring (fp8 -> f32 conversion is exact)."""
    from voxtral_tpu.ops.flash_decode import flash_decode_attention_batched

    rng = np.random.default_rng(31)
    bsz, n_layers, kh, g, d = 3, 2, 2, 4, 8
    cap, window, block = 64, 48, 16
    h = kh * g
    ks8 = jnp.asarray(
        rng.standard_normal((bsz, n_layers, kh, cap, d)), jnp.float32
    ).astype(jnp.float8_e4m3fn)
    vs8 = jnp.asarray(
        rng.standard_normal((bsz, n_layers, kh, cap, d)), jnp.float32
    ).astype(jnp.float8_e4m3fn)
    qs = jnp.asarray(rng.standard_normal((bsz, h, d)), jnp.float32)
    pos = jnp.asarray([4, 47, 130], jnp.int32)

    kw = dict(window=window, block=block, interpret=True, flat=flat,
              out_dtype=jnp.float32)
    got = np.asarray(flash_decode_attention_batched(
        qs, ks8, vs8, jnp.int32(1), pos, **kw
    ))
    ref = np.asarray(flash_decode_attention_batched(
        qs, ks8.astype(jnp.float32), vs8.astype(jnp.float32),
        jnp.int32(1), pos, **kw
    ))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("dtype", ["float32", "float8_e4m3fn"])
def test_fused_write_attention_matches_two_step(dtype):
    """The one-launch fused kernel == ring_rows_write then flash attention:
    same outputs AND same updated caches, for ragged per-stream positions
    (first token, ring wrap, mid-fill) in both ring dtypes."""
    from voxtral_tpu.ops.flash_decode import (
        flash_decode_attention_batched,
        flash_decode_write_attention_batched,
    )
    from voxtral_tpu.ops.ring import ring_rows_write

    rng = np.random.default_rng(41)
    bsz, n_layers, kh, g, d = 5, 2, 2, 4, 8
    # the in-place write window is 16 slots (2-byte) / 32 (byte-wide) and
    # must divide the block
    cap, window, block = 64, 48, (32 if dtype == "float8_e4m3fn" else 16)
    h = kh * g
    rdt = jnp.dtype(dtype)
    ks = jnp.asarray(
        rng.standard_normal((bsz, n_layers, kh, cap, d)), jnp.float32
    ).astype(rdt)
    vs = jnp.asarray(
        rng.standard_normal((bsz, n_layers, kh, cap, d)), jnp.float32
    ).astype(rdt)
    qs = jnp.asarray(rng.standard_normal((bsz, h, d)), jnp.float32)
    krow = jnp.asarray(rng.standard_normal((bsz, kh, d)), jnp.float32)
    vrow = jnp.asarray(rng.standard_normal((bsz, kh, d)), jnp.float32)
    pos = jnp.asarray([0, 5, 47, 63, 200], jnp.int32)
    li = jnp.int32(1)

    # reference: batched row write (vmapped custom op), then attention
    wk, wv = jax.vmap(ring_rows_write, in_axes=(0, 0, 0, 0, None, 0))(
        ks, vs, krow, vrow, li, pos
    )
    ref = np.asarray(flash_decode_attention_batched(
        qs, wk, wv, li, pos, window=window, block=block, interpret=True,
        out_dtype=jnp.float32,
    ))

    got, gk, gv = flash_decode_write_attention_batched(
        qs, ks, vs, krow, vrow, li, pos,
        window=window, block=block, interpret=True, out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(gk.astype(jnp.float32)), np.asarray(wk.astype(jnp.float32))
    )
    np.testing.assert_array_equal(
        np.asarray(gv.astype(jnp.float32)), np.asarray(wv.astype(jnp.float32))
    )


def test_fused_write_attention_vmap_entry():
    """jax.vmap over the single-stream fused entry routes to the batched
    kernel and matches the unbatched per-stream loop."""
    from voxtral_tpu.ops.flash_decode import flash_decode_write_attention

    rng = np.random.default_rng(43)
    bsz, n_layers, kh, g, d = 3, 2, 2, 2, 8
    cap, window, block = 32, 24, 16   # block must hold the 16-slot window
    h = kh * g
    ks = jnp.asarray(
        rng.standard_normal((bsz, n_layers, kh, cap, d)), jnp.float32
    )
    vs = jnp.asarray(
        rng.standard_normal((bsz, n_layers, kh, cap, d)), jnp.float32
    )
    qs = jnp.asarray(rng.standard_normal((bsz, h, d)), jnp.float32)
    krow = jnp.asarray(rng.standard_normal((bsz, kh, d)), jnp.float32)
    vrow = jnp.asarray(rng.standard_normal((bsz, kh, d)), jnp.float32)
    pos = jnp.asarray([2, 31, 77], jnp.int32)

    fn = lambda q, k, v, kr, vr, p: flash_decode_write_attention(
        q, k, v, kr, vr, jnp.int32(0), p, window=window, block=block,
    )
    got, gk, gv = jax.vmap(fn)(qs, ks, vs, krow, vrow, pos)
    for b in range(bsz):
        ref, rk, rv = fn(qs[b], ks[b], vs[b], krow[b], vrow[b], pos[b])
        np.testing.assert_allclose(
            np.asarray(got[b]), np.asarray(ref), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(gk[b]), np.asarray(rk))
        np.testing.assert_array_equal(np.asarray(gv[b]), np.asarray(rv))


def test_flash_vmap_routes_to_batched():
    """jax.vmap over the single-stream entry must work (custom_vmap rule)."""
    rng = np.random.default_rng(13)
    bsz, n_layers, kh, g, d = 2, 3, 2, 2, 8
    cap, window, block = 32, 24, 8
    h = kh * g
    ks = jnp.asarray(
        rng.standard_normal((bsz, n_layers, kh, cap, d)), jnp.float32
    )
    vs = jnp.asarray(
        rng.standard_normal((bsz, n_layers, kh, cap, d)), jnp.float32
    )
    qs = jnp.asarray(rng.standard_normal((bsz, h, d)), jnp.float32)
    pos = jnp.asarray([7, 29], jnp.int32)

    f = lambda q, k, v, p: flash_decode_attention(
        q, k, v, jnp.int32(2), p, window=window, block=block
    )
    got = np.asarray(jax.vmap(f)(qs, ks, vs, pos))
    for b in range(bsz):
        ref = np.asarray(f(qs[b], ks[b], vs[b], pos[b]))
        np.testing.assert_allclose(got[b], ref, atol=1e-5, rtol=1e-5)
