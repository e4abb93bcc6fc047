"""Long-stream soak: continuous mode over many ring wraps.

The reference admits long-transcription stress of the KV circular buffer is
under-tested (README.md:7).  Here a tiny-config continuous stream runs long
enough to wrap every ring many times and trip the live-mode watchdogs;
invariants: bounded host memory, bounded logical state, restarts observed,
and the stream keeps producing tokens after each restart epoch.
"""

import numpy as np
import pytest

from conftest import make_audio
from voxtral_tpu.runtime.stream import VoxStream


@pytest.mark.slow
def test_continuous_soak(engine):
    s = VoxStream(engine)
    s.set_continuous(True)
    s.set_processing_interval(0.5)

    # Shrink the KV-overflow threshold so the dec ring (64) is exercised the
    # way STREAM_MAX_DECODE_KV=2000 exercises the 2048 serving ring.
    import voxtral_tpu.runtime.stream as stream_mod

    orig = stream_mod.STREAM_MAX_DECODE_KV
    stream_mod.STREAM_MAX_DECODE_KV = 56
    try:
        total_tokens = 0
        restarts = 0
        last_dec_pos = 0
        rng = np.random.default_rng(0)
        for i in range(60):  # 60 seconds of audio in 1 s chunks
            audio = make_audio(1.0, seed=int(rng.integers(1 << 30)))
            s.feed(audio)
            toks = s.get()
            total_tokens += len(toks)
            if s.dec_pos < last_dec_pos:
                restarts += 1
            last_dec_pos = s.dec_pos
            # live-mode bound: dec position can never exceed the threshold
            # by more than one burst (exact-size bursts are < 32)
            assert s.dec_pos <= 56 + 32 + engine.prompt_len
            # queued adapter rows stay bounded
            assert sum(a.shape[0] for a in s.adapter_q) < 512
            assert s.mel_ctx.n_frames < 2048
        assert total_tokens > 0
        assert restarts >= 1, "expected at least one live-mode restart"
        # stream must still be alive and decodable
        s.feed(make_audio(1.0, seed=123))
        assert not s.finished
    finally:
        stream_mod.STREAM_MAX_DECODE_KV = orig
