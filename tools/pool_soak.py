#!/usr/bin/env python
"""Long-stream serving soak: N continuous live streams for M minutes.

The reference's own admitted weak spot is long-transcription stress of the
rolling KV machinery (README.md:7); its unbounded-live viability rests on
the watchdog/restart subsystem (voxtral.c:1137-1187).  This drives the
batched analog at full size on the chip: a StreamPool of N continuous
slots fed 1x-realtime for M wall-minutes (far past every ring's wrap
point), reporting

  - tick-latency p50/p90 for the FIRST and LAST quarter of the run
    (drift = a leak or fill-degradation signal),
  - per-slot restarts by the pool's classified causes (self-healing is
    EXPECTED to fire on synthetic gibberish — the soak asserts it keeps
    streams alive, not that it never triggers),
  - aggregate token throughput, and the shape-derived HBM ledger
    (stable across quarters by construction; printed to catch pool-side
    array growth bugs).

Usage: python tools/pool_soak.py [model_dir]
env: SOAK_STREAMS (default 16) · SOAK_MINUTES (default 10) · SOAK_INTERVAL
(feed seconds, default 0.5) · SOAK_GATE (encode gate seconds, default
0.8x interval) · SOAK_ENC_MODE/SOAK_ENC_RING/SOAK_DEC_RING/SOAK_KV
(default the load-ring16 recipe: ring, 896, 1024, float8_e4m3fn) ·
SOAK_QUANT (int8|int4 weight-only decoder — soak the quantized serving
rung; default off = exact bf16 weights) · SOAK_WAV (source clip; falls back
to synthetic audio when the default reference-sample path is absent) ·
SOAK_TICK_LOG (log EVERY tick with its encode/decode wall split and token
count — the cadence diagnostic for the -I 0.5 latency conjunction, where
p50 sits within ~3% of the 300 ms bar and the per-tick shape, not the
mean, is the thing to fix; docs/PERF.md round 4)
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np


def log(msg):
    print(f"[soak] {msg}", file=sys.stderr, flush=True)


def pct(xs, p):
    return float(np.percentile(np.asarray(xs), p)) if xs else -1.0


def main():
    model_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "VOXTRAL_MODEL_DIR", "/root/ckpt-fake"
    )
    n = int(os.environ.get("SOAK_STREAMS", "16"))
    minutes = float(os.environ.get("SOAK_MINUTES", "10"))
    interval = float(os.environ.get("SOAK_INTERVAL", "0.5"))
    gate = float(os.environ.get("SOAK_GATE", str(0.8 * interval)))
    enc_mode = os.environ.get("SOAK_ENC_MODE", "ring")
    enc_ring = int(os.environ.get("SOAK_ENC_RING", "896"))
    dec_ring = int(os.environ.get("SOAK_DEC_RING", "1024"))
    kv = os.environ.get("SOAK_KV", "float8_e4m3fn")
    quant = os.environ.get("SOAK_QUANT", "")

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
                        enc_kv_ring=enc_ring, dec_kv_ring=dec_ring,
                        quantize=quant or False)
    pool = StreamPool(
        eng, n, dec_kv_ring=dec_ring, enc_mode=enc_mode,
        enc_kv_ring=enc_ring, enc_kv_dtype=kv, dec_kv_dtype=kv,
    )
    slots = []
    for _ in range(n):
        i = pool.add_stream()
        pool.set_processing_interval(i, gate)
        pool.set_continuous(i, True)
        slots.append(i)

    # wav from env (the reference checkout path is machine-specific) with a
    # synthetic fallback so the soak runs anywhere (ADVICE r4)
    wav = os.environ.get("SOAK_WAV", "/root/reference/samples/jfk.wav")
    if os.path.exists(wav):
        audio = np.tile(load_wav(wav), 8)   # ~88 s source, offsets wrap below
    else:
        log(f"{wav} not found; using synthetic audio (set SOAK_WAV)")
        rng = np.random.default_rng(0)
        t = np.arange(90 * 16000) / 16000.0
        audio = (0.25 * np.sin(2 * np.pi * 220 * t)
                 * np.sin(2 * np.pi * 1.3 * t)
                 + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
    feed_n = int(interval * 16000)

    deadline = time.monotonic() + minutes * 60.0
    ticks, tokens = [], 0
    ti = 0
    log(f"soaking {n} streams x {minutes:.0f} min at -I {interval} "
        f"(gate {gate}, {enc_mode}/{kv}, enc {enc_ring} dec {dec_ring}"
        f"{', ' + quant if quant else ''})")
    tick_log = os.environ.get("SOAK_TICK_LOG", "") == "1"
    while time.monotonic() < deadline:
        off = (ti * feed_n) % (len(audio) - feed_n)
        for i in slots:
            pool.feed(i, audio[off : off + feed_n])
        t1 = time.monotonic()
        e0, d0 = pool.encoder_ms, pool.decoder_ms
        gen0 = sum(s.n_generated for s in pool.slots)
        pool.tick()
        for i in slots:
            tokens += len(pool.get(i))
        ticks.append((time.monotonic() - t1) * 1000.0)
        if tick_log:
            log(f"tick {ti}: {ticks[-1]:.0f} ms (enc "
                f"{pool.encoder_ms - e0:.0f} / dec {pool.decoder_ms - d0:.0f}"
                f") {sum(s.n_generated for s in pool.slots) - gen0} tok")
        ti += 1
        if ti % 200 == 0:
            led = pool.memory_ledger()
            log(f"tick {ti}: p50 {pct(ticks[-200:], 50):.0f} ms, "
                f"{tokens} tokens, "
                f"{sum(s.n_restarts for s in pool.slots)} restarts, "
                f"{led['total_resident'] / (1 << 30):.2f} GiB resident")

    q = max(1, len(ticks) // 4)
    first, last = ticks[1:q], ticks[-q:]   # drop tick 0 (compiles)
    restarts = sum(s.n_restarts for s in pool.slots)
    alive = sum(1 for s in pool.slots if s.active)
    led = pool.memory_ledger()
    audio_s = ti * interval * n
    print(
        f"SOAK {n} streams x {ti} ticks (-I {interval}, {enc_mode}/{kv}"
        f"{', ' + quant if quant else ''}): "
        f"first-quarter p50 {pct(first, 50):.0f}/p90 {pct(first, 90):.0f} ms"
        f" -> last-quarter p50 {pct(last, 50):.0f}/p90 {pct(last, 90):.0f} ms"
        f"; {tokens} tokens ({tokens / max(1e-9, audio_s) * 8.0:.1f}% of "
        f"1 tok/80ms), {restarts} restarts, {alive}/{n} streams alive, "
        f"{led['total_resident'] / (1 << 30):.2f} GiB resident"
    )
    # pass/fail: every stream alive, last quarter not degraded >1.5x, and
    # the tick wall still inside the feed interval (sustainable)
    ok = (
        alive == n
        and pct(last, 50) < max(1.5 * pct(first, 50), 50.0)
        and pct(last, 50) < interval * 1000.0
    )
    print("SOAK " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
