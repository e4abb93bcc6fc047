"""Native (C++) host runtime vs the Python implementations."""

import numpy as np
import pytest

from conftest import make_audio
from voxtral_tpu import native
from voxtral_tpu.audio.mel import MelContext, mel_spectrogram

needs_native = pytest.mark.skipif(
    not native.available(), reason="native voxhost not built"
)


@needs_native
def test_native_batch_mel_matches_python():
    audio = make_audio(1.1, seed=1)
    ref = mel_spectrogram(audio)
    got = native.mel_spectrogram(audio)
    assert got is not None and got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


@needs_native
def test_native_mel_context_matches_python():
    audio = make_audio(2.0, seed=2)
    left = 32 * 1280
    py = MelContext(left)
    nt = native.NativeMelContext(left)
    rng = np.random.default_rng(0)
    i = 0
    while i < len(audio):
        n = int(rng.integers(100, 5000))
        chunk = audio[i : i + n]
        py.feed(chunk)
        nt.feed(chunk)
        assert nt.n_frames == py.n_frames
        i += n
    # interleave a discard
    py.discard_before(40)
    nt.discard_before(40)
    assert nt.mel_frame_offset == py.mel_frame_offset == 40
    py.feed(np.zeros(17 * 1280, np.float32))
    nt.feed(np.zeros(17 * 1280, np.float32))
    py.finish(0)
    nt.finish(0)
    assert nt.n_frames == py.n_frames
    np.testing.assert_allclose(nt.data(), py.data(), atol=2e-4, rtol=2e-4)


@needs_native
def test_native_s16():
    pcm = np.array([-32768, -1, 0, 1, 16384, 32767], dtype=np.int16)
    got = native.s16_to_f32(pcm)
    np.testing.assert_allclose(got, pcm.astype(np.float32) / 32768.0)


def test_make_mel_context_fallback(monkeypatch):
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    ctx = native.make_mel_context(100)
    assert isinstance(ctx, MelContext)


@needs_native
def test_stream_with_native_mel(engine):
    """The stream runs with the native mel context and produces a similar
    transcript to the Python-mel stream (mel differs at ~2e-4, so individual
    argmax flips on the random tiny model are tolerated)."""
    from voxtral_tpu.runtime.stream import VoxStream

    audio = make_audio(2.0, seed=21)
    s_py = VoxStream(engine)
    s_py.feed(audio)
    s_py.finish()
    ref = s_py.get()

    s_nt = VoxStream(engine)
    s_nt.mel_ctx = native.NativeMelContext(32 * 1280)
    s_nt.feed(audio)
    s_nt.finish()
    got = s_nt.get()
    assert len(got) > 0
    assert abs(len(got) - len(ref)) <= max(3, len(ref) // 4)
