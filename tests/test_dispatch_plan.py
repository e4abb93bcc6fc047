"""Dispatch planning (engine.fused_sizes / burst_size): the p50-latency
contract is that a steady streaming feed is ONE fused-encode program and ONE
decode burst (docs/PERF.md round 2).  Pure host logic — no jit."""

import pytest

from voxtral_tpu.config import tiny_config
from voxtral_tpu.runtime.engine import VoxtralEngine, decompose


@pytest.fixture(scope="module")
def eng(params, tiny_tokenizer):
    return VoxtralEngine(
        tiny_config(), params, tokenizer=tiny_tokenizer,
        buckets=(16, 4, 1), enc_kv_ring=64, dec_kv_ring=64,
    )


def test_fused_sizes_cover_exactly(eng):
    for q_total in (0, 8, 48, 56, 96, 104, 512, 1000):
        q_total -= q_total % 8
        plan = eng.fused_sizes(q_total)
        assert sum(plan) == q_total
        # every chunk must fit the encoder ring alongside the window
        cap = 2 * (eng.enc_kv_ring - eng.cfg.encoder.window)
        for q in plan:
            assert q <= max(cap, max(eng.fused_buckets, default=0))


def test_steady_state_feed_is_one_dispatch(eng):
    # a 0.5 s feed at 100 mel frames/s -> 48 aligned frames; the tiny ring
    # (64) caps chunks but a real engine (ring 1280, window 750) takes any
    # feed below 2.6 s in ONE program
    from voxtral_tpu.config import full_config

    class FakeEng:
        cfg = full_config()
        enc_kv_ring = 1280
        fused_buckets = (512, 256)
        fused_sizes = VoxtralEngine.fused_sizes

    fe = FakeEng()
    assert fe.fused_sizes(48) == [48]
    assert fe.fused_sizes(200) == [200]
    assert fe.fused_sizes(1000) == [512, 256, 232]


def test_burst_size_single_dispatch_small_backlogs(eng):
    # steady state (-I <= 2.5 s => < 32 rows) decodes in one exact program
    for avail in (1, 7, 25, 31):
        assert eng.burst_size(avail) == avail
    # large backlogs fall back to the power buckets
    assert eng.burst_size(40) == 16
    total, n = 40, 0
    while total:
        b = eng.burst_size(total)
        total -= b
        n += 1
    assert n <= 4


def test_decompose_exact():
    assert decompose(21, (16, 4, 1)) == [16, 4, 1]
    assert decompose(0, (16, 4, 1)) == []
