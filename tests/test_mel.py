"""Mel frontend: batch vs torch.stft oracle, incremental vs batch."""

import numpy as np

from conftest import make_audio
from voxtral_tpu.audio.mel import MelContext, mel_spectrogram
from voxtral_tpu.config import NUM_MEL_BINS


def test_batch_mel_matches_torch_stft():
    from oracle import oracle_mel

    audio = make_audio(1.3)
    ours = mel_spectrogram(audio)
    ref = oracle_mel(audio)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_batch_mel_frame_count():
    audio = np.zeros(16000, dtype=np.float32)
    mel = mel_spectrogram(audio)
    # (16000 + 400 - 400)/160 + 1 frames, minus the dropped last one
    assert mel.shape == (100, NUM_MEL_BINS)


def test_incremental_equals_batch():
    audio = make_audio(2.0, seed=1)
    left = 32 * 1280
    right = 17 * 1280
    padded = np.concatenate(
        [np.zeros(left, np.float32), audio, np.zeros(right, np.float32)]
    )
    ref = mel_spectrogram(padded)

    ctx = MelContext(left)
    rng = np.random.default_rng(2)
    i = 0
    while i < len(audio):
        n = int(rng.integers(1, 4000))
        ctx.feed(audio[i : i + n])
        i += n
    ctx.feed(np.zeros(right, np.float32))
    ctx.finish(0)
    got = ctx.data()
    assert ctx.mel_frame_offset == 0
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_incremental_discard_keeps_offsets():
    audio = make_audio(3.0, seed=3)
    ctx = MelContext(0)
    ctx.feed(audio)
    full = ctx.data().copy()
    n0 = ctx.n_frames

    ctx2 = MelContext(0)
    ctx2.feed(audio[:24000])
    ctx2.discard_before(50)
    assert ctx2.mel_frame_offset == 50
    ctx2.feed(audio[24000:])
    tail = ctx2.data()
    assert ctx2.mel_frame_offset + ctx2.n_frames == n0
    np.testing.assert_allclose(tail, full[50:], atol=1e-6)


def test_finish_reflect_matches_batch_nonzero_tail():
    """Finishing right after real audio (no zero pad) must reflect the audio
    itself on the right, matching batch reflect padding.  The left edge
    differs by design: the incremental context zero-pads (reflect over the
    stream's leading silence, voxtral_audio.c:544-545), so the first two
    frames — whose windows touch the left 200-sample pad — are excluded."""
    audio = make_audio(0.8, seed=5)
    ref = mel_spectrogram(audio)
    ctx = MelContext(0)
    ctx.feed(audio)
    ctx.finish(0)
    got = ctx.data()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got[2:], ref[2:], atol=1e-5, rtol=1e-5)


def test_device_mel_matches_host():
    from voxtral_tpu.audio.mel_device import mel_spectrogram_device

    audio = make_audio(1.2, seed=9)
    ref = mel_spectrogram(audio)
    got = np.asarray(mel_spectrogram_device(np.asarray(audio)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-4)

    batch = np.stack([audio, audio * 0.5])
    got_b = np.asarray(mel_spectrogram_device(batch))
    np.testing.assert_allclose(got_b[0], ref, atol=3e-4, rtol=3e-4)
