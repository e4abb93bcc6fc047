"""Pallas flash-decode kernel vs the XLA ring attention (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from voxtral_tpu.ops.flash_decode import flash_decode_attention
from voxtral_tpu.ops.ring import ring_attention, ring_write


@pytest.mark.parametrize("pos", [0, 3, 15, 16, 40, 63, 64, 100, 200])
def test_flash_decode_matches_ring(pos):
    rng = np.random.default_rng(pos)
    cap, window, block = 64, 48, 16
    kh, g, d = 2, 4, 8
    h = kh * g

    k_ring = jnp.zeros((kh, cap, d), jnp.float32)
    v_ring = jnp.zeros((kh, cap, d), jnp.float32)
    for p in range(pos + 1):
        kv = rng.standard_normal((1, kh, d)).astype(np.float32)
        vv = rng.standard_normal((1, kh, d)).astype(np.float32)
        k_ring = ring_write(k_ring, jnp.asarray(kv), jnp.int32(p))
        v_ring = ring_write(v_ring, jnp.asarray(vv), jnp.int32(p))

    q = rng.standard_normal((h, d)).astype(np.float32)
    ref = np.asarray(
        ring_attention(jnp.asarray(q)[None], k_ring, v_ring, jnp.int32(pos),
                       window=window)
    )[0]
    got = np.asarray(
        flash_decode_attention(
            jnp.asarray(q), k_ring, v_ring, jnp.int32(pos),
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
    k_ring = jnp.zeros((kh, cap, d), jnp.float32)
    v_ring = jnp.zeros((kh, cap, d), jnp.float32)
    pos = 50
    for p in range(pos + 1):
        k_ring = ring_write(
            k_ring, jnp.asarray(rng.standard_normal((1, kh, d)), jnp.float32),
            jnp.int32(p))
        v_ring = ring_write(
            v_ring, jnp.asarray(rng.standard_normal((1, kh, d)), jnp.float32),
            jnp.int32(p))
    q = rng.standard_normal((h, d)).astype(np.float32)
    ref = np.asarray(
        ring_attention(jnp.asarray(q)[None], k_ring, v_ring, jnp.int32(pos),
                       window=window)
    )[0]
    got = np.asarray(
        flash_decode_attention(jnp.asarray(q), k_ring, v_ring, jnp.int32(pos),
                               window=window, block=block, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
