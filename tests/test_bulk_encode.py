"""Bulk (no-ring) offline encoder: kernel correctness + equivalence with the
incremental ring path (the reference's batch-vs-incremental encoder contract,
voxtral_encoder.c:135-312 vs :452-636)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxtral_tpu.models.bulk_encode import bulk_encode_clip, bulk_encode_clips
from voxtral_tpu.ops.banded_encode import banded_attention_batched


def _ref_banded(q, k, v, window):
    """Plain masked-softmax reference: [B, T, H, D], positions 0..T-1."""
    b, t, h, d = q.shape
    kh = k.shape[2]
    g = h // kh
    qg = q.reshape(b, t, kh, g, d).astype(jnp.float32)
    scores = jnp.einsum("btkgd,bskd->bkgts", qg, k.astype(jnp.float32))
    scores = scores / np.sqrt(d)
    qpos = jnp.arange(t)[:, None]
    kpos = jnp.arange(t)[None, :]
    valid = (kpos <= qpos) & (kpos > qpos - window)
    scores = jnp.where(valid[None, None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgts,bskd->btkgd", probs, v.astype(jnp.float32))
    return out.reshape(b, t, h, d)


@pytest.mark.parametrize(
    "t,window,bq,bk",
    [
        (64, 24, 8, 128),      # window << T, tiny blocks
        (40, 100, 8, 128),     # window > T (full causal), unpadded T
        (300, 96, 128, 128),   # multiple q tiles, band spans tiles
        (260, 250, 64, 128),   # band wider than a tile, T % bk != 0
    ],
)
def test_banded_kernel_matches_reference(t, window, bq, bk):
    rng = np.random.default_rng(t + window)
    kh, g, d = 4, 2, 8
    q = jnp.asarray(rng.standard_normal((2, t, kh * g, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, t, kh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, t, kh, d)), jnp.float32)
    got = banded_attention_batched(
        q, k, v, window=window, block_q=bq, block_k=bk
    )
    want = _ref_banded(q, k, v, window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_bulk_rows_match_incremental(engine, cfg, params):
    """The bulk path must produce the same adapter rows as the incremental
    ring path (same math, different attention mechanism — f32 tiny config,
    so tolerances are numerical-order-only)."""
    from conftest import make_audio

    from voxtral_tpu.audio.mel import MelContext
    from voxtral_tpu.config import N_LEFT_PAD_TOKENS, RAW_AUDIO_LENGTH_PER_TOK

    ctx = MelContext(N_LEFT_PAD_TOKENS * RAW_AUDIO_LENGTH_PER_TOK)
    ctx.feed(make_audio(1.28, seed=3))
    ctx.finish(0)
    mel = ctx.data()
    mel = mel[: (mel.shape[0] // 8) * 8]

    bulk = bulk_encode_clip(
        params["encoder"], params["adapter"], cfg, jnp.asarray(mel)
    )

    # incremental reference through the engine's chunked ring path
    inc_rows = []
    cache = engine.new_enc_cache()
    from voxtral_tpu.models.fused_stream import ConvTails

    tails = ConvTails.create(cfg)
    pos = 0
    i = 0
    for q in engine.fused_sizes(mel.shape[0]):
        rows, tails, cache = engine.fused_encode(
            jnp.asarray(mel[i : i + q]), tails, cache, pos
        )
        pos += q // 2
        inc_rows.append(np.asarray(rows, np.float32))
        i += q
    inc = np.concatenate(inc_rows, axis=0)

    assert bulk.shape == inc.shape
    np.testing.assert_allclose(np.asarray(bulk), inc, rtol=2e-4, atol=2e-4)


def _window_chunks(cfg, params, mel, split, wp):
    """Drive window_encode_chunk over two chunks with a wp-row context."""
    import jax.numpy as jnp

    from voxtral_tpu.models.bulk_encode import window_encode_chunk

    e = cfg.encoder
    mel_tail = jnp.zeros((2, e.n_mel), jnp.float32)
    c0_tail = jnp.zeros((2, e.dim), cfg.cdtype)
    xwin = jnp.zeros((wp, e.dim), cfg.cdtype)
    n_ctx = jnp.int32(0)
    rows_all = []
    for lo, hi in [(0, split), (split, mel.shape[0])]:
        rows, mel_tail, c0_tail, xwin, n_ctx = window_encode_chunk(
            params["encoder"], params["adapter"], cfg,
            jnp.asarray(mel[lo:hi]), mel_tail, c0_tail, xwin, n_ctx,
        )
        rows_all.append(np.asarray(rows))
    return np.concatenate(rows_all, axis=0)


def test_window_recompute_truncation_semantics(cfg, params):
    """Window-recompute is EXACT when the retained context covers every
    layer's receptive field, and an approximation when it doesn't: with the
    minimum pad, context rows near the edge are recomputed from truncated
    lower-layer windows (bulk_encode.window_encode_chunk docstring)."""
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((160, cfg.encoder.n_mel)).astype(np.float32)

    bulk = np.asarray(bulk_encode_clip(
        params["encoder"], params["adapter"], cfg, jnp.asarray(mel)
    ))

    # wp covers the whole history -> nothing truncated at any depth
    full = _window_chunks(cfg, params, mel, split=96, wp=80)
    dev_full = np.max(np.abs(full - bulk))
    np.testing.assert_allclose(full, bulk, rtol=2e-4, atol=2e-4)

    # minimum pad (one window) -> deep-layer receptive fields truncate
    from voxtral_tpu.models.bulk_encode import window_pad

    trunc = _window_chunks(cfg, params, mel, split=96, wp=window_pad(cfg))
    dev_trunc = np.max(np.abs(trunc - bulk))
    assert dev_trunc > dev_full, (dev_trunc, dev_full)

    # extra context pushes the truncation one attention-hop deeper; with
    # only 2 layers in the tiny config, extra=1 is already fully exact
    ext = _window_chunks(cfg, params, mel, split=96, wp=window_pad(cfg, 1))
    np.testing.assert_allclose(ext, bulk, rtol=2e-4, atol=2e-4)


def test_bulk_batched_matches_single(cfg, params):
    """One batched launch == per-stream calls (custom_vmap routing)."""
    rng = np.random.default_rng(9)
    mel_b = jnp.asarray(rng.standard_normal((3, 48, cfg.encoder.n_mel)),
                        jnp.float32)
    got = bulk_encode_clips(params["encoder"], params["adapter"], cfg, mel_b)
    for s in range(3):
        one = bulk_encode_clip(
            params["encoder"], params["adapter"], cfg, mel_b[s]
        )
        np.testing.assert_allclose(
            np.asarray(got[s]), np.asarray(one), rtol=1e-5, atol=1e-5
        )
