"""Mic-mode loop semantics (main.c:235-296 parity), driven with fake
capture/stream objects — no audio hardware, no model."""

import io

import numpy as np

from voxtral_tpu.config import SAMPLE_RATE
from voxtral_tpu.mic import MicCapture, run_mic_loop


class FakeCapture:
    """Scripted capture: a list of float32 chunks, read like the ring."""

    def __init__(self, chunks):
        self.buf = [np.asarray(c, np.float32) for c in chunks]
        self.n = sum(len(c) for c in self.buf)

    def available(self):
        return self.n

    def eof(self):
        return self.n == 0

    def read(self, max_samples):
        out, got = [], 0
        while self.buf and got < max_samples:
            head = self.buf[0]
            need = max_samples - got
            if len(head) <= need:
                out.append(head)
                got += len(head)
                self.buf.pop(0)
            else:
                out.append(head[:need])
                self.buf[0] = head[need:]
                got = max_samples
        self.n -= got
        if not out:
            return np.zeros(0, np.float32)
        return np.concatenate(out)


class FakeStream:
    def __init__(self):
        self.fed = 0
        self.feeds = []
        self.flushes = 0

    def feed(self, f):
        self.fed += len(f)
        self.feeds.append(len(f))

    def flush(self):
        self.flushes += 1


def _voice(seconds):
    t = np.arange(int(seconds * SAMPLE_RATE)) / SAMPLE_RATE
    return (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)


def _silence(seconds):
    return np.zeros(int(seconds * SAMPLE_RATE), np.float32)


def test_silence_skip_feed_after_flush():
    """<=600 ms of silence feeds through, then ONE flush, then nothing is
    fed until voice returns (main.c:261-288)."""
    cap = FakeCapture([_voice(1.0), _silence(3.0), _voice(0.5)])
    s = FakeStream()
    run_mic_loop(s, cap, lambda: None, sleep_fn=lambda _: None)
    # fed: 1.0 s voice + 0.6 s leading silence + 0.5 s trailing voice
    expect = int((1.0 + 0.6 + 0.5) * SAMPLE_RATE)
    assert abs(s.fed - expect) <= SAMPLE_RATE // 10  # within one chunk
    assert s.flushes == 1


def test_flush_rearms_after_voice():
    """Each voice→silence transition flushes exactly once."""
    cap = FakeCapture(
        [_voice(0.8), _silence(2.0), _voice(0.8), _silence(2.0)]
    )
    s = FakeStream()
    # the scripted 5.6 s shows up as instant backlog; disable catch-up so
    # this test isolates the flush re-arming
    run_mic_loop(
        s, cap, lambda: None, sleep_fn=lambda _: None,
        overbuffer_skip_s=1e9,
    )
    assert s.flushes == 2


def test_overbuffer_catchup_drains_to_keep():
    """A backlog > 5 s is drained to ~1 s before feeding resumes
    (main.c:235-250)."""
    warns = []
    cap = FakeCapture([_voice(8.0)])
    s = FakeStream()
    run_mic_loop(
        s, cap, lambda: None, sleep_fn=lambda _: None, warn=warns.append
    )
    # 8 s buffered -> skip 7 s, keep 1 s; everything kept is voice and feeds
    assert len(warns) == 1 and "skipping" in warns[0]
    assert abs(s.fed - SAMPLE_RATE) <= SAMPLE_RATE // 10
    assert s.flushes == 0


def test_no_catchup_below_threshold():
    cap = FakeCapture([_voice(4.0)])
    s = FakeStream()
    warns = []
    run_mic_loop(
        s, cap, lambda: None, sleep_fn=lambda _: None, warn=warns.append
    )
    assert not warns
    assert s.fed == int(4.0 * SAMPLE_RATE)


def test_mic_capture_ring_bounds_and_order():
    """MicCapture: reader thread drains a pipe, ring stays bounded, data
    survives in order; read() is non-blocking."""
    n = SAMPLE_RATE  # 1 s
    pcm = (np.sin(np.arange(n) * 0.01) * 20000).astype("<i2")
    cap = MicCapture(io.BytesIO(pcm.tobytes()), ring_seconds=10.0)
    got = []
    import time

    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline:
        chunk = cap.read(4096)
        if len(chunk):
            got.append(chunk)
        elif cap.eof():
            break
        else:
            time.sleep(0.005)
    out = np.concatenate(got)
    assert len(out) == n
    np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0)


def test_mic_capture_ring_drops_oldest_when_full():
    n = SAMPLE_RATE * 2
    pcm = np.arange(n, dtype="<i2")
    cap = MicCapture(io.BytesIO(pcm.tobytes()), ring_seconds=0.5)
    import time

    deadline = time.monotonic() + 5.0
    while not cap._eof and time.monotonic() < deadline:
        time.sleep(0.01)
    assert cap.available() <= int(0.5 * SAMPLE_RATE) + 1600
    tail = cap.read(1 << 30)
    # the newest samples survive
    assert int(tail[-1] * 32768.0) == n - 1
