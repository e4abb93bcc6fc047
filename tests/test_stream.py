"""Streaming state machine: chunking invariance, offline-schedule parity with
the torch oracle, flush semantics, restarts."""

import numpy as np
import pytest

from conftest import make_audio
from voxtral_tpu.runtime.stream import VoxStream


def _stream_tokens(engine, audio, feed_sizes=None, interval=None):
    s = VoxStream(engine)
    if interval is not None:
        s.set_processing_interval(interval)
    if feed_sizes is None:
        s.feed(audio)
    else:
        i = 0
        j = 0
        while i < len(audio):
            n = feed_sizes[j % len(feed_sizes)]
            s.feed(audio[i : i + n])
            i += n
            j += 1
    s.finish()
    return s.get(), s


def _oracle_tokens(engine, params_np, cfg, audio):
    """Offline pipeline through the torch oracle (mel is the engine's — mel
    parity has its own tests)."""
    from oracle import (
        oracle_adapter,
        oracle_conv_stem,
        oracle_decode_greedy,
        oracle_encoder,
    )

    from voxtral_tpu.audio.mel import MelContext
    from voxtral_tpu.config import (
        N_LEFT_PAD_TOKENS,
        RAW_AUDIO_LENGTH_PER_TOK,
        n_right_pad_tokens,
    )

    ctx = MelContext(N_LEFT_PAD_TOKENS * RAW_AUDIO_LENGTH_PER_TOK)
    ctx.feed(audio)
    align = (
        RAW_AUDIO_LENGTH_PER_TOK - (len(audio) % RAW_AUDIO_LENGTH_PER_TOK)
    ) % RAW_AUDIO_LENGTH_PER_TOK
    pad = align + n_right_pad_tokens(engine.delay_tokens) * RAW_AUDIO_LENGTH_PER_TOK
    ctx.feed(np.zeros(pad, np.float32))
    ctx.finish(0)
    mel = ctx.data()

    conv = oracle_conv_stem(params_np["encoder"], cfg, mel)
    enc = oracle_encoder(params_np["encoder"], cfg, conv)
    usable = (len(enc) // 4) * 4
    ada = oracle_adapter(params_np["adapter"], cfg, enc[:usable])
    raw = oracle_decode_greedy(params_np["decoder"], cfg, ada)
    # text tokens only, as the stream enqueues them
    pieces = []
    for t in raw:
        if engine.tokenizer.classify(t) == engine.tokenizer.TOK_TEXT:
            pieces.append(engine.tokenizer.decode(t))
    return pieces


@pytest.mark.slow
def test_stream_matches_oracle_offline(engine, params_np, cfg):
    audio = make_audio(2.5, seed=11)
    got, s = _stream_tokens(engine, audio)
    ref = _oracle_tokens(engine, params_np, cfg, audio)
    assert got == ref


@pytest.mark.slow
def test_stream_feed_chunking_invariance(engine):
    """Identical tokens regardless of feed granularity or interval."""
    audio = make_audio(2.2, seed=13)
    base, s0 = _stream_tokens(engine, audio)
    small, s1 = _stream_tokens(engine, audio, feed_sizes=[1600, 2000, 400])
    fast, s2 = _stream_tokens(engine, audio, feed_sizes=[8000], interval=0.1)
    assert small == base
    assert fast == base
    assert s1.n_generated == s0.n_generated


def test_flush_then_continue(engine):
    """flush() emits delayed tokens but leaves the stream open; tokens
    produced before flush must be a prefix of the final sequence when the
    same padding boundary is respected."""
    audio = make_audio(2.4, seed=17)
    s = VoxStream(engine)
    cut = (len(audio) // 2 // 1280) * 1280  # flush at a token boundary
    s.feed(audio[:cut])
    s.flush()
    early = list(s.get())
    assert not s.finished
    s.feed(audio[cut:])
    s.finish()
    late = s.get()
    assert len(early) > 0
    assert len(early) + len(late) > len(early)


def test_restart_counters(engine):
    """Watchdog logic unit test (no model involvement): forced restarts."""
    s = VoxStream(engine)
    s.set_continuous(True)
    s.decoder_started = True
    s.dec_pos = 2001  # > STREAM_MAX_DECODE_KV
    s.total_adapter = 10
    s._maybe_restart()
    # KV overflow forces a *full* reset
    assert s.dec_pos == 0 and not s.decoder_started
    assert s.total_adapter == 0 and s.enc_pos == 0 and not s._conv_init

    s2 = VoxStream(engine)
    s2.set_continuous(True)
    s2.eos_seen = True
    s2.text_since_restart = True
    s2.enc_pos = 5
    s2._maybe_restart()
    # EOS restart is decoder-only
    assert not s2.decoder_started and s2.enc_pos == 5
    assert s2.empty_restarts == 0

    s3 = VoxStream(engine)
    s3.set_continuous(True)
    s3.eos_seen = True
    s3.text_since_restart = False
    s3._maybe_restart()
    assert s3.empty_restarts == 1
    s3.eos_seen = True
    s3.text_since_restart = False
    s3.enc_pos = 7
    s3._maybe_restart()
    # second consecutive empty restart escalates to full reset
    assert s3.enc_pos == 0 and s3.empty_restarts == 0


def test_no_decode_watchdog(engine):
    s = VoxStream(engine)
    s.set_continuous(True)
    s.decoder_started = True
    s.enc_pos = 3
    s.real_samples_fed = 16000 * 25
    s.last_decode_sample = 0
    s.text_since_restart = False
    s._maybe_restart()
    # the no-decode watchdog (type 4) escalates straight to a full reset
    # (voxtral.c:1161-1163: need_restart >= 2 forces full_reset)
    assert not s.decoder_started and s.enc_pos == 0
    assert s.last_decode_sample == s.real_samples_fed


def test_continuous_ring_overflow_restarts_not_raises(params, tiny_tokenizer):
    """A live stream whose per-pass backlog would cross the KV-ring cap must
    restart (KV-overflow full reset) instead of raising mid-stream.  Uses a
    ring smaller than the window so a single large burst hits the cap
    (ADVICE r1: reachable in the CLI live mode with -I ~5)."""
    from voxtral_tpu.config import tiny_config
    from voxtral_tpu.runtime.engine import VoxtralEngine

    cfg = tiny_config(dec_window=96, dec_kv_ring=64)
    eng = VoxtralEngine(
        cfg, params, tokenizer=tiny_tokenizer, buckets=(16, 4, 1),
        enc_kv_ring=64, dec_kv_ring=64,
    )
    audio = make_audio(8.0, seed=23)
    s = VoxStream(eng)
    s.set_continuous(True)
    s.set_processing_interval(6.0)  # one huge backlog per pass
    # prompt (39) + backlog must cross the 64-slot ring inside one burst loop
    s.feed(audio)
    assert s._ring_overflow is False  # cleared by the reset
    assert s.dec_pos <= eng.dec_kv_ring
    # the overflow escalated to a full reset (need=2)
    assert not s.decoder_started or s.dec_pos < 64
    # and the non-continuous stream still raises loudly
    s2 = VoxStream(eng)
    s2.set_processing_interval(6.0)
    with pytest.raises(RuntimeError, match="KV ring"):
        s2.feed(audio)


@pytest.mark.slow
def test_fused_streaming_matches_general(engine, cfg, params, tiny_tokenizer):
    """The fused one-program audio path must produce identical transcripts
    to the exact bucketed path."""
    from voxtral_tpu.runtime.engine import VoxtralEngine

    audio = make_audio(2.3, seed=71)

    eng_general = VoxtralEngine(
        cfg, params, tokenizer=tiny_tokenizer, buckets=(16, 4, 1),
        enc_kv_ring=64, dec_kv_ring=64, fused_streaming=False,
    )
    eng_fused = VoxtralEngine(
        cfg, params, tokenizer=tiny_tokenizer, buckets=(16, 4, 1),
        enc_kv_ring=64, dec_kv_ring=64, fused_streaming=True,
    )
    eng_fused.fused_buckets = (16, 8)

    ref, _ = _stream_tokens(eng_general, audio)
    got, _ = _stream_tokens(eng_fused, audio)
    assert got == ref

    # odd feed sizes exercise the unaligned-remainder deferral
    got2, _ = _stream_tokens(eng_fused, audio, feed_sizes=[1601, 1999, 403])
    assert got2 == ref
