"""Pallas flash bulk attention (encoder kernel) vs the XLA ring attention
(interpret mode), including ring wraparound, vmap routing, and the
chunking-invariance property the kernel's absolute-block walk guarantees."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxtral_tpu.ops.flash_encode import flash_bulk_attention
from voxtral_tpu.ops.ring import ring_attention, ring_write


def _write_chunks(k_ring, v_ring, kv, vv, sizes):
    """Write rows of kv/vv into the rings in the given chunk sizes."""
    pos = 0
    for s in sizes:
        k_ring = ring_write(k_ring, jnp.asarray(kv[pos : pos + s]), jnp.int32(pos))
        v_ring = ring_write(v_ring, jnp.asarray(vv[pos : pos + s]), jnp.int32(pos))
        pos += s
    return k_ring, v_ring


@pytest.mark.parametrize(
    "pos0,t", [(0, 8), (0, 33), (40, 24), (100, 16), (120, 8), (250, 40)]
)
def test_flash_bulk_matches_ring(pos0, t):
    """Same masked set as the XLA path, incl. wraparound (cap 128 < pos+t)."""
    rng = np.random.default_rng(pos0 + t)
    cap, window, block = 128, 48, 32
    kh, d = 2, 8
    h = kh  # MHA like the encoder

    n = pos0 + t
    kv = rng.standard_normal((n, kh, d)).astype(np.float32)
    vv = rng.standard_normal((n, kh, d)).astype(np.float32)
    k_ring = jnp.zeros((kh, cap, d), jnp.float32)
    v_ring = jnp.zeros((kh, cap, d), jnp.float32)
    k_ring, v_ring = _write_chunks(k_ring, v_ring, kv, vv, [n])

    q = rng.standard_normal((t, h, d)).astype(np.float32)
    ref = np.asarray(
        ring_attention(jnp.asarray(q), k_ring, v_ring, jnp.int32(pos0),
                       window=window)
    )
    got = np.asarray(
        flash_bulk_attention(jnp.asarray(q), k_ring, v_ring, jnp.int32(pos0),
                             window=window, block=block, bq=16)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_flash_bulk_gqa():
    """Grouped queries (g>1) fold into the row axis correctly."""
    rng = np.random.default_rng(7)
    cap, window, block = 64, 24, 16
    kh, g, d = 2, 4, 8
    h = kh * g
    pos0, t = 30, 12

    n = pos0 + t
    kv = rng.standard_normal((n, kh, d)).astype(np.float32)
    vv = rng.standard_normal((n, kh, d)).astype(np.float32)
    k_ring = jnp.zeros((kh, cap, d), jnp.float32)
    v_ring = jnp.zeros((kh, cap, d), jnp.float32)
    k_ring, v_ring = _write_chunks(k_ring, v_ring, kv, vv, [n])

    q = rng.standard_normal((t, h, d)).astype(np.float32)
    ref = np.asarray(
        ring_attention(jnp.asarray(q), k_ring, v_ring, jnp.int32(pos0),
                       window=window)
    )
    got = np.asarray(
        flash_bulk_attention(jnp.asarray(q), k_ring, v_ring, jnp.int32(pos0),
                             window=window, block=block, bq=8)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_flash_bulk_vmap_routes_batched():
    """jax.vmap over streams must hit the batched kernel (per-stream pos)."""
    rng = np.random.default_rng(11)
    cap, window, block = 64, 24, 16
    kh, d, t, b = 2, 8, 8, 3
    h = kh

    rings_k, rings_v, poss, qs, refs = [], [], [], [], []
    for s in range(b):
        pos0 = 5 + 13 * s
        n = pos0 + t
        kv = rng.standard_normal((n, kh, d)).astype(np.float32)
        vv = rng.standard_normal((n, kh, d)).astype(np.float32)
        k_ring = jnp.zeros((kh, cap, d), jnp.float32)
        v_ring = jnp.zeros((kh, cap, d), jnp.float32)
        k_ring, v_ring = _write_chunks(k_ring, v_ring, kv, vv, [n])
        q = rng.standard_normal((t, h, d)).astype(np.float32)
        refs.append(
            np.asarray(
                ring_attention(jnp.asarray(q), k_ring, v_ring,
                               jnp.int32(pos0), window=window)
            )
        )
        rings_k.append(k_ring)
        rings_v.append(v_ring)
        poss.append(pos0)
        qs.append(q)

    got = np.asarray(
        jax.vmap(
            lambda q, k, v, p: flash_bulk_attention(
                q, k, v, p, window=window, block=block, bq=8
            )
        )(
            jnp.asarray(np.stack(qs)), jnp.stack(rings_k), jnp.stack(rings_v),
            jnp.asarray(poss, jnp.int32),
        )
    )
    np.testing.assert_allclose(got, np.stack(refs), rtol=2e-5, atol=2e-5)


def test_flash_bulk_chunking_invariant_bitwise():
    """The absolute-block walk makes results BIT-identical regardless of how
    the same positions were fed (the repo's chunking-invariance invariant)."""
    rng = np.random.default_rng(3)
    cap, window, block = 128, 48, 32
    kh, d = 2, 8

    n = 96
    kv = rng.standard_normal((n, kh, d)).astype(np.float32)
    vv = rng.standard_normal((n, kh, d)).astype(np.float32)
    q_all = rng.standard_normal((n, kh, d)).astype(np.float32)

    def run(sizes):
        k_ring = jnp.zeros((kh, cap, d), jnp.float32)
        v_ring = jnp.zeros((kh, cap, d), jnp.float32)
        outs = []
        pos = 0
        for s in sizes:
            k_ring = ring_write(k_ring, jnp.asarray(kv[pos : pos + s]),
                                jnp.int32(pos))
            v_ring = ring_write(v_ring, jnp.asarray(vv[pos : pos + s]),
                                jnp.int32(pos))
            outs.append(
                np.asarray(
                    flash_bulk_attention(
                        jnp.asarray(q_all[pos : pos + s]), k_ring, v_ring,
                        jnp.int32(pos), window=window, block=block, bq=8,
                    )
                )
            )
            pos += s
        return np.concatenate(outs)

    a = run([96])
    b = run([32, 32, 32])
    c = run([8, 40, 24, 24])
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


def test_encoder_flash_impl_matches_xla():
    """encode_chunk with attn_impl='flash' (the explicit opt-in; 'auto'
    resolves to xla) equals the xla path on a tiny config (tolerance:
    online vs full softmax in f32)."""
    import dataclasses

    from voxtral_tpu.config import tiny_config
    from voxtral_tpu.models.encoder import EncKVCache, encode_chunk
    from voxtral_tpu.models.params import init_params

    cfg = tiny_config(enc_kv_ring=64)
    params = init_params(cfg, seed=0)["encoder"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, cfg.encoder.dim)).astype(np.float32))

    outs = {}
    for impl in ("xla", "flash"):
        c = cfg.replace(encoder=dataclasses.replace(cfg.encoder, attn_impl=impl))
        cache = EncKVCache.create(c.encoder, c.kvdtype, 64)
        y, cache = encode_chunk(params, c, x.astype(c.cdtype), cache, jnp.int32(0))
        y2, _ = encode_chunk(
            params, c, x.astype(c.cdtype), cache, jnp.int32(x.shape[0])
        )
        outs[impl] = np.concatenate([np.asarray(y, np.float32),
                                     np.asarray(y2, np.float32)])
    np.testing.assert_allclose(outs["flash"], outs["xla"], rtol=3e-2, atol=3e-2)
