"""Encoder path: chunked conv stem + ring-cache transformer + adapter vs the
full-sequence torch oracle."""

import jax.numpy as jnp
import numpy as np

from conftest import make_audio
from voxtral_tpu.runtime.engine import decompose


def _chunked_conv_stem(engine, mel, buckets):
    """Drive conv0/conv1 through the engine exactly like the stream does."""
    cfg = engine.cfg
    c0_tail = jnp.zeros((2, cfg.encoder.n_mel), jnp.float32)
    c1_tail = jnp.zeros((2, cfg.encoder.dim), cfg.cdtype)
    c0_backlog = []
    outs = []
    i = 0
    for b in decompose(len(mel), buckets):
        out, c0_tail = engine.conv0(jnp.asarray(mel[i : i + b]), c0_tail)
        c0_backlog.append(np.asarray(out))
        i += b
    c0 = np.concatenate(c0_backlog, axis=0)
    n = (len(c0) // 2) * 2
    j = 0
    for b in decompose(n // 2, buckets):
        feed = jnp.asarray(c0[j : j + 2 * b])
        c1, c1_tail = engine.conv1(feed, c1_tail)
        outs.append(np.asarray(c1))
        j += 2 * b
    return np.concatenate(outs, axis=0)


def test_conv_stem_chunked_matches_oracle(engine, params_np, cfg):
    from oracle import oracle_conv_stem

    mel = np.random.default_rng(0).standard_normal((96, cfg.encoder.n_mel))
    mel = mel.astype(np.float32) * 0.3
    ref = oracle_conv_stem(params_np["encoder"], cfg, mel)

    for buckets in [(16, 4, 1), (4, 1), (1,)][:2]:
        got = _chunked_conv_stem(engine, mel, buckets)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_encoder_chunked_matches_oracle(engine, params_np, cfg):
    """Ring cache + chunked incremental forward == full-sequence oracle.
    Sequence (88) far exceeds the window (24) and the chunking varies, so
    this exercises sliding-window masking, ring wraparound (ring 64), and
    logical RoPE positions."""
    from oracle import oracle_encoder

    s = 88
    x = np.random.default_rng(1).standard_normal((s, cfg.encoder.dim))
    x = (x * 0.2).astype(np.float32)
    ref = oracle_encoder(params_np["encoder"], cfg, x)

    cache = engine.new_enc_cache()
    outs = []
    pos = 0
    for b in decompose(s, (16, 4, 1)):
        y, cache = engine.encode(jnp.asarray(x[pos : pos + b]), cache, pos)
        outs.append(np.asarray(y))
        pos += b
    got = np.concatenate(outs, axis=0)
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-4)


def test_adapter_matches_oracle(engine, params_np, cfg):
    from oracle import oracle_adapter

    x = np.random.default_rng(2).standard_normal((24, cfg.encoder.dim))
    x = x.astype(np.float32)
    ref = oracle_adapter(params_np["adapter"], cfg, x)
    got = np.asarray(engine.adapter(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_full_audio_front_matches_oracle(engine, params_np, cfg):
    """mel -> conv -> encoder -> adapter, chunked, vs oracle end-to-end."""
    from oracle import oracle_adapter, oracle_conv_stem, oracle_encoder

    from voxtral_tpu.audio.mel import mel_spectrogram

    audio = make_audio(1.0, seed=7)
    mel = mel_spectrogram(audio)
    mel = mel[: (len(mel) // 2) * 2]

    conv_ref = oracle_conv_stem(params_np["encoder"], cfg, mel)
    enc_ref = oracle_encoder(params_np["encoder"], cfg, conv_ref)
    usable = (len(enc_ref) // 4) * 4
    ada_ref = oracle_adapter(params_np["adapter"], cfg, enc_ref[:usable])

    conv = _chunked_conv_stem(engine, mel, (16, 4, 1))
    cache = engine.new_enc_cache()
    outs = []
    pos = 0
    for b in decompose(len(conv), (16, 4, 1)):
        y, cache = engine.encode(jnp.asarray(conv[pos : pos + b]), cache, pos)
        outs.append(np.asarray(y))
        pos += b
    enc = np.concatenate(outs, axis=0)
    got = np.asarray(engine.adapter(jnp.asarray(enc[:usable])))
    np.testing.assert_allclose(got, ada_ref, atol=1e-3, rtol=1e-3)
