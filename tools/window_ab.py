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
default 1024)
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

    grand = {e: [0, 0] for e in extras}
    for wav in wavs:
        audio = tile_to(load_wav(wav), seconds)
        name = os.path.basename(wav)
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
            print(f"WINDOW-AB {name} extra={e}: {d}/{n} tokens differ "
                  f"({1000.0 * d / max(1, n):.1f} flips/1k; "
                  f"ring {len(base)} vs window {len(win)} tokens, "
                  f"+{time.monotonic() - t0:.0f}s)")

    for e in extras:
        d, n = grand[e]
        print(f"WINDOW-AB TOTAL extra={e}: {d}/{n} "
              f"({1000.0 * d / max(1, n):.1f} flips/1k)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
