"""BatchedTranscriber (lockstep serving) must reproduce single-stream
transcripts for every stream in the batch."""

import numpy as np
import pytest

from conftest import make_audio
from voxtral_tpu.parallel.serving import BatchedTranscriber
from voxtral_tpu.runtime.stream import VoxStream
from voxtral_tpu.audio.mel import MelContext
from voxtral_tpu.config import (
    N_LEFT_PAD_TOKENS,
    RAW_AUDIO_LENGTH_PER_TOK,
    n_right_pad_tokens,
)


def _padded_mel(engine, audio):
    ctx = MelContext(N_LEFT_PAD_TOKENS * RAW_AUDIO_LENGTH_PER_TOK)
    ctx.feed(audio)
    align = (
        RAW_AUDIO_LENGTH_PER_TOK - (len(audio) % RAW_AUDIO_LENGTH_PER_TOK)
    ) % RAW_AUDIO_LENGTH_PER_TOK
    pad = align + n_right_pad_tokens(engine.delay_tokens) * RAW_AUDIO_LENGTH_PER_TOK
    ctx.feed(np.zeros(pad, np.float32))
    ctx.finish(0)
    return ctx.data()


@pytest.mark.slow
def test_batched_matches_single(engine):
    audios = [make_audio(2.0, seed=s) for s in (61, 62, 63)]
    mels = [_padded_mel(engine, a) for a in audios]
    n = min(m.shape[0] for m in mels)
    batch_mel = np.stack([m[:n] for m in mels])

    tr = BatchedTranscriber(engine, batch=3, dec_kv_ring=64)
    tok_lists = tr.transcribe(batch_mel, interval_frames=48)

    def single(audio):
        s = VoxStream(engine)
        s.set_processing_interval(0.1)
        s.feed(audio)
        s.finish()
        return s.get()

    tok = engine.tokenizer
    for i, audio in enumerate(audios):
        ref = single(audio)
        got = [tok.decode(t) for t in tok_lists[i]
               if tok.classify(t) == tok.TOK_TEXT]
        m = min(len(got), len(ref))
        assert m > 0
        assert got[:m] == ref[:m], f"stream {i}"
