"""StreamPool dynamic serving: per-slot streams match single-stream output."""

import numpy as np
import pytest

from conftest import make_audio
from voxtral_tpu.parallel.scheduler import StreamPool
from voxtral_tpu.runtime.stream import VoxStream


def _pieces(engine, token_ids):
    tok = engine.tokenizer
    return [tok.decode(t) for t in token_ids
            if tok.classify(t) == tok.TOK_TEXT]


@pytest.mark.slow
def test_pool_matches_single_stream(engine):
    pool = StreamPool(engine, n_slots=3, dec_kv_ring=64)
    audio_a = make_audio(2.5, seed=41)
    audio_b = make_audio(2.5, seed=42)
    pad = np.zeros(17 * 1280, np.float32)

    sa = pool.add_stream()
    sb = pool.add_stream()
    pool.slots[sa].continuous = False
    pool.slots[sb].continuous = False

    # interleaved feeding, slot b joins "later" in wall time but both are
    # complete streams; tick processes in lockstep quanta
    pool.feed(sa, audio_a)
    pool.feed(sa, pad)
    pool.tick()
    pool.feed(sb, audio_b)
    pool.feed(sb, pad)
    for _ in range(12):
        pool.tick()
    got_a = _pieces(engine, pool.get(sa))
    got_b = _pieces(engine, pool.get(sb))

    def single(audio):
        s = VoxStream(engine)
        s.set_processing_interval(0.1)
        s.feed(audio)
        s.feed(pad)
        ref = s.get()
        return ref

    ref_a = single(audio_a)
    ref_b = single(audio_b)

    # the pool's 64-frame quanta leave a shorter tail unprocessed than the
    # single stream's 10-frame interval: compare on the common prefix
    # (the tiny random model may hit EOS early — both paths must agree there)
    assert len(got_a) > 0 and len(got_b) > 0
    n_a = min(len(got_a), len(ref_a))
    n_b = min(len(got_b), len(ref_b))
    assert n_a > 0 and n_b > 0
    assert got_a[:n_a] == ref_a[:n_a]
    assert got_b[:n_b] == ref_b[:n_b]


def test_pool_admission_and_close(engine):
    pool = StreamPool(engine, n_slots=2, dec_kv_ring=64)
    a = pool.add_stream()
    b = pool.add_stream()
    with pytest.raises(RuntimeError):
        pool.add_stream()
    pool.close(a)
    c = pool.add_stream()
    assert c == a
    assert pool.slots[b].active


@pytest.mark.slow
def test_pool_join_leave_churn(engine):
    """Slots joining and leaving mid-flight must not disturb live streams."""
    pool = StreamPool(engine, n_slots=3, dec_kv_ring=64)
    pad = np.zeros(17 * 1280, np.float32)
    audio_a = make_audio(2.5, seed=81)

    sa = pool.add_stream()
    pool.slots[sa].continuous = False
    pool.feed(sa, audio_a)
    pool.feed(sa, pad)
    # churn: other slots join, receive audio, get closed, rejoin
    sb = pool.add_stream()
    pool.feed(sb, make_audio(1.0, seed=82))
    for i in range(14):
        pool.tick()
        if i == 3:
            pool.close(sb)
        if i == 6:
            sc = pool.add_stream()
            pool.slots[sc].continuous = False
            pool.feed(sc, make_audio(1.5, seed=83))
            pool.feed(sc, pad)
    got_a = _pieces(engine, pool.get(sa))

    s = VoxStream(engine)
    s.set_processing_interval(0.1)
    s.feed(audio_a)
    s.feed(pad)
    ref_a = s.get()
    n = min(len(got_a), len(ref_a))
    assert n > 0 and got_a[:n] == ref_a[:n]
