#!/usr/bin/env python
"""Benchmark: aggregate transcription throughput per chip (x-realtime).

Workload (BASELINE.json): 16 concurrent streams of a 60 s clip, batch-mode
schedule (2 s processing interval), full pipeline — incremental mel on host,
conv stem + 32-layer encoder + adapter + 26-layer decoder burst on device.
Primary metric: x-realtime per chip = (streams x audio seconds) / wall time.
Reference best: RTF 0.3998 == 2.5x realtime on an M3 Max (SPEED.md:8-18).

Weights: loads the real checkpoint from $VOXTRAL_MODEL_DIR if present, else
random bf16 weights of identical shapes (identical compute/memory traffic;
transcript fidelity is covered by tests/oracle parity, not by this bench).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REF_X_REALTIME = 1.0 / 0.3998  # reference corpus RTF (SPEED.md:16)


def _supervised() -> int:
    """Run the measurement in a child process with a stall watchdog.

    The remote-TPU tunnel in some environments occasionally drops an RPC and
    wedges the client forever; the child prints progress lines, and a parent
    that sees no output for BENCH_STALL_S seconds kills and retries."""
    stall = float(os.environ.get("BENCH_STALL_S", "420"))
    attempts = int(os.environ.get("BENCH_ATTEMPTS", "5"))
    env = dict(os.environ, BENCH_INNER="1")
    for a in range(1, attempts + 1):
        print(f"[bench] attempt {a}/{attempts}", file=sys.stderr, flush=True)
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        last = time.monotonic()
        result = None
        import selectors

        sel = selectors.DefaultSelector()
        sel.register(proc.stdout, selectors.EVENT_READ)
        while proc.poll() is None:
            events = sel.select(timeout=15)
            if events:
                line = proc.stdout.readline()
                if line:
                    last = time.monotonic()
                    if line.lstrip().startswith("{") and '"metric"' in line:
                        result = line.strip()
                    else:
                        print(line, end="", file=sys.stderr, flush=True)
            if time.monotonic() - last > stall:
                print(f"[bench] stalled {stall:.0f}s; killing child",
                      file=sys.stderr, flush=True)
                proc.kill()
                break
        for line in proc.stdout:
            if line.lstrip().startswith("{") and '"metric"' in line:
                result = line.strip()
        if result:
            print(result)
            return 0
        print("[bench] attempt failed; cooling down 60s", file=sys.stderr,
              flush=True)
        time.sleep(60)
    print(json.dumps({
        "metric": "aggregate_x_realtime_per_chip_60s_16streams",
        "value": -1, "unit": "x_realtime", "vs_baseline": -1,
        "extra": {"error": "all attempts stalled (TPU tunnel)"},
    }))
    return 1


def main():
    n_streams = int(os.environ.get("BENCH_STREAMS", "16"))
    seconds = float(os.environ.get("BENCH_SECONDS", "60"))
    interval_frames = int(os.environ.get("BENCH_INTERVAL_FRAMES", "200"))

    import jax

    from voxtral_tpu.audio.mel import MelContext
    from voxtral_tpu.config import (
        N_LEFT_PAD_TOKENS,
        RAW_AUDIO_LENGTH_PER_TOK,
        full_config,
        n_right_pad_tokens,
    )
    from voxtral_tpu.models.params import init_params, load_params
    from voxtral_tpu.parallel.serving import BatchedTranscriber
    from voxtral_tpu.runtime.engine import VoxtralEngine
    from voxtral_tpu.tokenizer import TekkenTokenizer

    dev = jax.devices()[0]
    print(f"bench device: {dev}", file=sys.stderr)

    # Rings sized for a 60 s clip + serving restarts: decoder positions for
    # 60 s = 39 + 750 < 1024; encoder window 750 + max bucket 256 <= 1024.
    cfg = full_config()
    eng_kwargs = dict(buckets=(256, 64, 16, 4, 1), enc_kv_ring=1024,
                      dec_kv_ring=1024)

    model_dir = os.environ.get("VOXTRAL_MODEL_DIR", "")
    if model_dir and os.path.exists(os.path.join(model_dir, "consolidated.safetensors")):
        print(f"loading real weights from {model_dir}", file=sys.stderr)
        params = load_params(model_dir, cfg)
        tok = TekkenTokenizer.load(os.path.join(model_dir, "tekken.json"))
    else:
        print("no checkpoint found; using random bf16 weights (same "
              "compute/memory traffic)", file=sys.stderr)
        params = init_params(cfg, seed=0)
        tok = TekkenTokenizer([bytes([i % 256]) for i in range(1000)], 1000)

    engine = VoxtralEngine(cfg, params, tokenizer=tok, **eng_kwargs)

    # --- build the mel workload on host (not timed as device work but
    # included in wall time during the timed run) --------------------------
    rng = np.random.default_rng(0)
    n = int(seconds * 16000)
    t = np.arange(n) / 16000.0
    audio = (0.25 * np.sin(2 * np.pi * 220 * t) * np.sin(2 * np.pi * 1.3 * t)
             + 0.05 * rng.standard_normal(n)).astype(np.float32)

    def padded_mel(a: np.ndarray) -> np.ndarray:
        ctx = MelContext(N_LEFT_PAD_TOKENS * RAW_AUDIO_LENGTH_PER_TOK)
        ctx.feed(a)
        align = (RAW_AUDIO_LENGTH_PER_TOK - (len(a) % RAW_AUDIO_LENGTH_PER_TOK)) \
            % RAW_AUDIO_LENGTH_PER_TOK
        pad = align + n_right_pad_tokens(engine.delay_tokens) * RAW_AUDIO_LENGTH_PER_TOK
        ctx.feed(np.zeros(pad, np.float32))
        ctx.finish(0)
        return ctx.data()

    mel_one = padded_mel(audio)
    mel = np.broadcast_to(mel_one, (n_streams,) + mel_one.shape).copy()
    print(f"workload: {n_streams} streams x {seconds:.0f}s "
          f"({mel_one.shape[0]} mel frames each)", file=sys.stderr)

    def run(tr, frames, label):
        t = frames.shape[1]
        i = 0
        k = 0
        while i < t:
            n = min(interval_frames, t - i)
            tr.feed_mel(frames[:, i : i + n])
            tr.run_decoder()
            i += n
            k += 1
            print(f"  {label} interval {k}: {i}/{t} frames, "
                  f"{tr.decode_steps} steps", file=sys.stderr, flush=True)
        return tr.tokens

    # --- warmup run (compilation) -----------------------------------------
    t0 = time.monotonic()
    warm = BatchedTranscriber(engine, n_streams)
    run(warm, mel[:, : 4 * interval_frames], "warmup")
    print(f"warmup+compile: {time.monotonic() - t0:.1f}s", file=sys.stderr)
    del warm
    import gc
    gc.collect()

    # --- timed run ---------------------------------------------------------
    t0 = time.monotonic()
    tr = BatchedTranscriber(engine, n_streams)
    tokens = run(tr, mel, "timed")
    wall = time.monotonic() - t0

    # --- phase 2: single-stream p50 token latency at -I 0.5 ----------------
    # Feed 0.5 s chunks; a token's latency is the wall time of the feed()
    # call that produced it (time from audio-available to token-out, the
    # engine-side component of streaming latency).
    from voxtral_tpu.runtime.stream import VoxStream

    chunk_n = 8000
    lat_ms: list[float] = []
    for run_i in range(2):  # first run absorbs single-stream compiles
        lat_ms = []
        s = VoxStream(engine)
        s.set_processing_interval(0.5)
        for j, i in enumerate(range(0, len(audio), chunk_n)):
            t1 = time.monotonic()
            s.feed(audio[i : i + chunk_n])
            dt = (time.monotonic() - t1) * 1000.0
            lat_ms += [dt] * len(s.get())
            if j % 16 == 0:
                print(f"  latency run {run_i} chunk {j}", file=sys.stderr,
                      flush=True)
        s.finish()
        s.get()
    p50 = float(np.percentile(lat_ms, 50)) if lat_ms else -1.0
    p90 = float(np.percentile(lat_ms, 90)) if lat_ms else -1.0

    total_audio = n_streams * seconds
    x_rt = total_audio / wall
    steps = tr.decode_steps + (engine.prompt_len - 1)
    step_ms = 1000.0 * tr.decode_time / max(tr.decode_steps, 1)
    extra = {
        "wall_s": round(wall, 3),
        "streams": n_streams,
        "audio_s_per_stream": seconds,
        "decode_steps_per_stream": tr.decode_steps,
        "decode_time_s": round(tr.decode_time, 3),
        "encode_time_s": round(tr.encode_time, 3),
        "decoder_step_ms_batched": round(step_ms, 3),
        "tokens_per_s_aggregate": round(n_streams * tr.decode_steps / wall, 1),
        "single_stream_x_realtime_est": round(seconds / wall, 2),
        "p50_token_latency_ms_I0.5": round(p50, 1),
        "p90_token_latency_ms_I0.5": round(p90, 1),
        "device": str(dev),
        "weights": "real" if model_dir else "random",
    }
    print(json.dumps({
        "metric": "aggregate_x_realtime_per_chip_60s_16streams",
        "value": round(x_rt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(x_rt / REF_X_REALTIME, 2),
        "extra": extra,
    }))
    del steps


if __name__ == "__main__":
    if os.environ.get("BENCH_INNER") or os.environ.get("BENCH_NO_SUPERVISOR"):
        main()
    else:
        sys.exit(_supervised())
