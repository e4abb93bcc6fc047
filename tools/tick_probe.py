#!/usr/bin/env python
"""Per-tick latency attribution for the load-ring16 serving configuration.

BENCH_r04's BASELINE conjunction (16 live streams, -I 0.5, p50 < 300 ms)
passed with ~3% margin; this probe breaks one tick into its terms so the
next shave targets the dominant one:

  encode wall   — the batched ring encode dispatch (+ any queue drain it
                  absorbs at the next sync)
  decode wall   — burst dispatches + the token fetches (each fetch drains
                  the whole deferred queue on the axon tunnel)
  bursts/tick   — the tunnel-round-trip multiplier: q = min(backlogs) means
                  uneven backlogs fragment one tick into several bursts

Usage: python tools/tick_probe.py [model_dir] [n_streams] [ticks]
Env: PROBE_GATE_S (default 0.4), PROBE_INTERVAL_S (default 0.5),
     PROBE_ENC_RING (default 896).
Reference metric contract: per-stream step latency, voxtral.c:1306-1317.
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np  # noqa: E402


def log(msg):
    print(f"[tickprobe] {msg}", file=sys.stderr, flush=True)


def main():
    model_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "VOXTRAL_MODEL_DIR", "/root/ckpt-fake")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    ticks = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    gate_s = float(os.environ.get("PROBE_GATE_S", "0.4"))
    interval_s = float(os.environ.get("PROBE_INTERVAL_S", "0.5"))
    enc_ring = int(os.environ.get("PROBE_ENC_RING", "896"))

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
    engine = VoxtralEngine(cfg, params, tokenizer=tok, buckets=(64, 16, 4, 1))

    wav = os.environ.get("PROBE_WAV", "/root/reference/samples/jfk.wav")
    audio = load_wav(wav)
    audio = np.tile(audio, 8)  # long enough for any tick count

    pool = StreamPool(
        engine, n, dec_kv_ring=1024, enc_mode="ring", enc_kv_ring=enc_ring,
        enc_kv_dtype="float8_e4m3fn", dec_kv_dtype="float8_e4m3fn",
    )
    slots = []
    for _ in range(n):
        i = pool.add_stream()
        pool.set_processing_interval(i, gate_s)
        pool.set_continuous(i, True)
        slots.append(i)

    feed_n = int(interval_s * 16000)
    split = os.environ.get("PROBE_SPLIT", "0") == "1"
    rows = []   # (tick_ms, enc_ms, dec_ms, bursts, burst_rows, fetch_ms)
    for rnd in range(2):          # round 0 absorbs compiles
        for ti in range(ticks):
            off = (ti * feed_n) % (len(audio) - feed_n)
            e0, d0 = pool.encoder_ms, pool.decoder_ms
            b0, r0, f0 = pool.n_bursts, pool.burst_rows, pool.fetch_ms
            ec0 = pool.n_enc_calls
            t1 = time.monotonic()
            for s in slots:
                pool.feed(s, audio[off:off + feed_n])
            if split:
                # run the tick's halves with a one-element D2H sync between:
                # attributes device compute to encode vs decode (the normal
                # tick's only sync is the token fetch, which drains BOTH)
                pool._tick_encoder()
                _ = np.asarray(pool.row_ring[0, 0, :1])  # sliced on device
                t_mid = time.monotonic()
                pool._tick_decoder()
                pool._mon_flush()
                # pure round trip: fetch of an already-realized tiny array
                t_r = time.monotonic()
                _ = np.asarray(pool.row_ring[0, 0, :1])
                rtt = (time.monotonic() - t_r) * 1000.0
                dt = (time.monotonic() - t1) * 1000.0
                enc_wall = (t_mid - t1) * 1000.0
                dec_wall = dt - enc_wall - rtt
            else:
                pool.tick()
                dt = (time.monotonic() - t1) * 1000.0
                enc_wall = pool.encoder_ms - e0
                dec_wall = pool.decoder_ms - d0
                rtt = 0.0
            if rnd:
                rows.append((
                    dt, enc_wall, dec_wall,
                    pool.n_bursts - b0, pool.burst_rows - r0,
                    pool.fetch_ms - f0, pool.n_enc_calls - ec0, rtt,
                ))
            for s in slots:
                pool.get(s)
            if ti % 8 == 0:
                log(f"round {rnd} tick {ti}/{ticks}: {dt:.0f} ms")

    a = np.array(rows)
    names = ["tick", "enc", "dec", "bursts", "rows", "fetch", "enc_calls",
             "rtt"]
    print(f"TICKPROBE n={n} interval={interval_s} gate={gate_s} "
          f"enc_ring={enc_ring} ticks={len(rows)}")
    for j, nm in enumerate(names):
        col = a[:, j]
        print(f"  {nm:9s} p50 {np.percentile(col, 50):8.1f}  "
              f"p90 {np.percentile(col, 90):8.1f}  "
              f"mean {col.mean():8.1f}  max {col.max():8.1f}")
    # per-tick detail for the worst 5 ticks
    worst = a[a[:, 0].argsort()][-5:]
    for r in worst:
        print("  worst: " + "  ".join(
            f"{nm}={v:.1f}" for nm, v in zip(names, r)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
