"""Ring-buffer ops: writes, logical positions, and attention vs a dense
reference — including wraparound and compaction-equivalence."""

import math

import jax.numpy as jnp
import numpy as np

from voxtral_tpu.ops.ring import ring_attention, ring_write, slot_logical_positions


def dense_windowed_attention(q, k, v, window, q_pos0):
    """Reference: full history K/V [S, KH, D], queries at q_pos0..q_pos0+T-1."""
    t, h, d = q.shape
    s, kh, _ = k.shape
    g = h // kh
    out = np.zeros((t, h, d), np.float32)
    for ti in range(t):
        qp = q_pos0 + ti
        for hi in range(h):
            ki = hi // g
            scores = []
            idxs = []
            for si in range(s):
                if si <= qp and si > qp - window:
                    scores.append(q[ti, hi] @ k[si, ki] / math.sqrt(d))
                    idxs.append(si)
            scores = np.array(scores)
            p = np.exp(scores - scores.max())
            p /= p.sum()
            out[ti, hi] = sum(pi * v[si, ki] for pi, si in zip(p, idxs))
    return out


def test_slot_logical_positions():
    l = np.asarray(slot_logical_positions(jnp.int32(9), 8))
    # slots 0..7; p_end=9 -> slot 1 holds 9, slot 2 holds 2, slot 0 holds 8
    assert l[1] == 9 and l[0] == 8 and l[2] == 2 and l[7] == 7


def test_ring_write_wraparound():
    ring = jnp.zeros((1, 4, 1))  # [KH=1, cap=4, D=1]
    for pos in range(7):
        ring = ring_write(ring, jnp.full((1, 1, 1), float(pos)), jnp.int32(pos))
    got = np.asarray(ring)[0, :, 0]
    np.testing.assert_array_equal(got, [4, 5, 6, 3])


def test_ring_write_bulk_matches_single():
    rng = np.random.default_rng(0)
    vals = rng.standard_normal((11, 2, 3)).astype(np.float32)  # [T, KH, D]
    r1 = jnp.zeros((2, 8, 3))  # [KH, cap, D]
    r2 = jnp.zeros((2, 8, 3))
    pos0 = 5
    for i in range(11):
        r1 = ring_write(r1, jnp.asarray(vals[i : i + 1]), jnp.int32(pos0 + i))
    r2 = ring_write(r2, jnp.asarray(vals), jnp.int32(pos0))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2))


def test_ring_write_larger_than_cap():
    rng = np.random.default_rng(1)
    vals = rng.standard_normal((13, 1, 2)).astype(np.float32)
    r1 = jnp.zeros((1, 8, 2))
    for i in range(13):
        r1 = ring_write(r1, jnp.asarray(vals[i : i + 1]), jnp.int32(i))
    r2 = ring_write(jnp.zeros((1, 8, 2)), jnp.asarray(vals), jnp.int32(0))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2))


def test_ring_attention_matches_dense():
    rng = np.random.default_rng(2)
    cap, window = 16, 6
    kh, g, d = 2, 2, 4
    h = kh * g
    total = 40  # wraps the ring multiple times
    k_hist = rng.standard_normal((total, kh, d)).astype(np.float32)
    v_hist = rng.standard_normal((total, kh, d)).astype(np.float32)
    q_all = rng.standard_normal((total, h, d)).astype(np.float32)

    k_ring = jnp.zeros((kh, cap, d))
    v_ring = jnp.zeros((kh, cap, d))
    pos = 0
    for t in [1, 3, 1, 8, 4, 1, 2, 8, 8, 4]:
        k_ring = ring_write(k_ring, jnp.asarray(k_hist[pos : pos + t]), jnp.int32(pos))
        v_ring = ring_write(v_ring, jnp.asarray(v_hist[pos : pos + t]), jnp.int32(pos))
        got = np.asarray(
            ring_attention(
                jnp.asarray(q_all[pos : pos + t]), k_ring, v_ring,
                jnp.int32(pos), window=window,
            )
        )
        ref = dense_windowed_attention(
            q_all[pos : pos + t], k_hist[: pos + t], v_hist[: pos + t],
            window, pos,
        )
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
        pos += t
