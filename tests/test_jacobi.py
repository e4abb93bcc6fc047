"""Jacobi fixpoint decoding must produce EXACTLY the sequential greedy
tokens, alts, and KV state."""

import jax.numpy as jnp
import numpy as np
import pytest

from voxtral_tpu.config import TOKEN_STREAMING_PAD
from voxtral_tpu.models import decoder as dec_mod
from voxtral_tpu.models.jacobi import decode_burst_jacobi


@pytest.mark.parametrize("t,window", [(8, 8), (16, 4), (32, 8), (21, 7)])
def test_jacobi_matches_sequential(engine, cfg, t, window):
    rng = np.random.default_rng(t * 31 + window)
    adapter = (rng.standard_normal((t, cfg.decoder.dim)) * 0.5).astype(np.float32)

    cache_s = engine.new_dec_cache()
    toks_s, _, _, _, cache_s = dec_mod.decode_burst(
        engine.params["decoder"], cfg, jnp.asarray(adapter),
        jnp.int32(TOKEN_STREAMING_PAD), cache_s, jnp.int32(0), engine.ada(),
    )

    cache_j = engine.new_dec_cache()
    toks_j, _, _, _, cache_j, iters = decode_burst_jacobi(
        engine.params["decoder"], cfg, jnp.asarray(adapter),
        jnp.int32(TOKEN_STREAMING_PAD), cache_j, jnp.int32(0), engine.ada(),
        window=window,
    )
    np.testing.assert_array_equal(np.asarray(toks_j), np.asarray(toks_s))
    # KV state must match the sequential one exactly (rings identical over
    # the written region; unwritten slots are both zero-init)
    np.testing.assert_allclose(
        np.asarray(cache_j.k), np.asarray(cache_s.k), atol=1e-5
    )
    assert int(iters) >= 1


def test_jacobi_alts_match_sequential(engine, cfg):
    rng = np.random.default_rng(5)
    t = 12
    adapter = (rng.standard_normal((t, cfg.decoder.dim)) * 0.5).astype(np.float32)

    cache_s = engine.new_dec_cache()
    toks_s, ai_s, ap_s, bp_s, _ = dec_mod.decode_burst(
        engine.params["decoder"], cfg, jnp.asarray(adapter),
        jnp.int32(TOKEN_STREAMING_PAD), cache_s, jnp.int32(0), engine.ada(),
        n_alt=3,
    )
    cache_j = engine.new_dec_cache()
    toks_j, ai_j, ap_j, bp_j, _, _ = decode_burst_jacobi(
        engine.params["decoder"], cfg, jnp.asarray(adapter),
        jnp.int32(TOKEN_STREAMING_PAD), cache_j, jnp.int32(0), engine.ada(),
        n_alt=3, window=6,
    )
    np.testing.assert_array_equal(np.asarray(toks_j), np.asarray(toks_s))
    np.testing.assert_array_equal(np.asarray(ai_j), np.asarray(ai_s))
    np.testing.assert_allclose(np.asarray(ap_j), np.asarray(ap_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(bp_j), np.asarray(bp_s), atol=1e-5)


def test_jacobi_continues_across_windows(engine, cfg):
    """Windows chain through prev-token and KV exactly like one long burst,
    including at ring-wraparound positions."""
    rng = np.random.default_rng(9)
    t = 48  # with dec ring 64 and pos0 40, wraps the ring
    adapter = (rng.standard_normal((t, cfg.decoder.dim)) * 0.5).astype(np.float32)

    # pre-populate context: sequential burst of 40 positions
    warm = (rng.standard_normal((40, cfg.decoder.dim)) * 0.5).astype(np.float32)
    cache_s = engine.new_dec_cache()
    toks_w, _, _, _, cache_s = dec_mod.decode_burst(
        engine.params["decoder"], cfg, jnp.asarray(warm),
        jnp.int32(TOKEN_STREAMING_PAD), cache_s, jnp.int32(0), engine.ada(),
    )
    prev = jnp.int32(int(np.asarray(toks_w)[-1]))
    cache_j = engine.new_dec_cache()
    _, _, _, _, cache_j = dec_mod.decode_burst(
        engine.params["decoder"], cfg, jnp.asarray(warm),
        jnp.int32(TOKEN_STREAMING_PAD), cache_j, jnp.int32(0), engine.ada(),
    )

    toks_s, _, _, _, _ = dec_mod.decode_burst(
        engine.params["decoder"], cfg, jnp.asarray(adapter), prev, cache_s,
        jnp.int32(40), engine.ada(),
    )
    toks_j, _, _, _, _, _ = decode_burst_jacobi(
        engine.params["decoder"], cfg, jnp.asarray(adapter), prev, cache_j,
        jnp.int32(40), engine.ada(), window=16,
    )
    np.testing.assert_array_equal(np.asarray(toks_j), np.asarray(toks_s))


def test_auto_mode_selects_by_burst_length(cfg, params, tiny_tokenizer):
    """decode_mode='auto': window-sized-or-larger bursts run the Jacobi
    program (jacobi_iters grows), shorter bursts run sequential — and both
    match a pure-sequential engine exactly."""
    from voxtral_tpu.runtime.engine import VoxtralEngine

    rng = np.random.default_rng(17)
    kw = dict(tokenizer=tiny_tokenizer, buckets=(16, 4, 1),
              enc_kv_ring=64, dec_kv_ring=64, jacobi_window=8)
    eng_a = VoxtralEngine(cfg, params, decode_mode="auto", **kw)
    eng_s = VoxtralEngine(cfg, params, decode_mode="sequential", **kw)

    short = (rng.standard_normal((4, cfg.decoder.dim)) * 0.5).astype(np.float32)
    ca, cs = eng_a.new_dec_cache(), eng_s.new_dec_cache()
    toks_a, _, _, _, ca = eng_a.decode_burst(short, TOKEN_STREAMING_PAD, ca, 0)
    toks_s, _, _, _, cs = eng_s.decode_burst(short, TOKEN_STREAMING_PAD, cs, 0)
    np.testing.assert_array_equal(np.asarray(toks_a), np.asarray(toks_s))
    assert len(eng_a.jacobi_iters) == 0          # short burst -> sequential

    long = (rng.standard_normal((16, cfg.decoder.dim)) * 0.5).astype(np.float32)
    prev = int(np.asarray(toks_a)[-1])
    toks_a, _, _, _, ca = eng_a.decode_burst(long, prev, ca, 4)
    toks_s, _, _, _, cs = eng_s.decode_burst(long, prev, cs, 4)
    np.testing.assert_array_equal(np.asarray(toks_a), np.asarray(toks_s))
    assert len(eng_a.jacobi_iters) == 1          # >= window -> Jacobi


def test_offline_auto_equals_sequential(cfg, params, tiny_tokenizer):
    """The offline bulk path under the auto policy transcribes identically
    to a forced-sequential engine (the flag-flip coverage for the CLI
    default)."""
    from conftest import make_audio
    from voxtral_tpu.runtime.engine import VoxtralEngine
    from voxtral_tpu.runtime.offline import transcribe_offline_ids

    audio = make_audio(1.6, seed=41)
    kw = dict(tokenizer=tiny_tokenizer, buckets=(16, 4, 1),
              enc_kv_ring=64, dec_kv_ring=128, jacobi_window=8)
    ids_s = transcribe_offline_ids(
        VoxtralEngine(cfg, params, decode_mode="sequential", **kw), audio
    )
    eng_a = VoxtralEngine(cfg, params, decode_mode="auto", **kw)
    ids_a = transcribe_offline_ids(eng_a, audio)
    assert ids_a == ids_s
    assert len(eng_a.jacobi_iters) > 0


def test_stream_with_jacobi_engine(engine, cfg, params, tiny_tokenizer):
    """Full streaming transcription with a Jacobi engine == sequential."""
    from conftest import make_audio
    from voxtral_tpu.runtime.engine import VoxtralEngine
    from voxtral_tpu.runtime.stream import VoxStream

    audio = make_audio(2.0, seed=33)
    s_ref = VoxStream(engine)
    s_ref.feed(audio)
    s_ref.finish()
    ref = s_ref.get()

    eng_j = VoxtralEngine(
        cfg, params, tokenizer=tiny_tokenizer, buckets=(16, 4, 1),
        enc_kv_ring=64, dec_kv_ring=64, decode_mode="jacobi", jacobi_window=8,
    )
    s_j = VoxStream(eng_j)
    s_j.feed(audio)
    s_j.finish()
    got = s_j.get()
    assert got == ref
    assert len(eng_j.jacobi_iters) > 0
