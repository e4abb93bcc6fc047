#!/usr/bin/env python
"""Mini-suite benchmark runner (reference benchmark.py protocol).

Runs the engine CLI over a small/medium/long suite of WAV files N times,
parses the engine's own stderr metric lines (the same `Audio:` / `Encoder:` /
`Decoder: ... ms/step` formats the reference emits and its benchmark.py
parses — voxtral.c:1306-1317, benchmark.py:25-30), and reports overall RTF,
weighted step ms, and short/long-clip step averages (SPEED.md:259-287).

Usage:
  python tools/benchmark.py -d MODEL_DIR [-n REPEATS] [files...]
"""

from __future__ import annotations

import argparse
import re
import statistics
import subprocess
import sys
import time
from pathlib import Path

AUDIO_RE = re.compile(r"Audio:\s+\d+\s+samples\s+\(([0-9.]+)\s+seconds?\)")
DECODER_RE = re.compile(
    r"Decoder:\s+\d+\s+text tokens\s+\((\d+)\s+steps\)\s+in\s+(\d+)\s+ms\s+"
    r"\(prefill\s+(\d+)\s+ms\s+\+\s+([0-9.]+)\s+ms/step\)"
)
ENCODER_RE = re.compile(r"Encoder:\s+\d+\s+mel\s+->\s+\d+\s+tokens\s+\((\d+)\s+ms\)")


def run_one(model_dir: str, wav: Path, extra: list[str]):
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "-m", "voxtral_tpu.cli", "-d", model_dir,
         "-i", str(wav)] + extra,
        capture_output=True, text=True,
    )
    wall = time.monotonic() - t0
    err = proc.stderr
    audio_m = AUDIO_RE.search(err)
    dec_m = DECODER_RE.search(err)
    enc_m = ENCODER_RE.search(err)
    if proc.returncode != 0 or not audio_m or not dec_m:
        print(err[-2000:], file=sys.stderr)
        raise RuntimeError(f"run failed for {wav}")
    return {
        "file": wav.name,
        "audio_sec": float(audio_m.group(1)),
        "steps": int(dec_m.group(1)),
        "decoder_ms": int(dec_m.group(2)),
        "prefill_ms": int(dec_m.group(3)),
        "step_ms": float(dec_m.group(4)),
        "encoder_ms": int(enc_m.group(1)) if enc_m else 0,
        "wall_sec": wall,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-d", "--model-dir", required=True)
    ap.add_argument("-n", "--repeats", type=int, default=1)
    ap.add_argument("files", nargs="*", type=Path)
    ap.add_argument("--cli-arg", action="append", default=[],
                    help="extra args forwarded to the CLI")
    args = ap.parse_args()

    files = args.files
    if not files:
        ref = Path("/root/reference/samples/benchmark/night1968")
        if ref.exists():
            files = sorted(ref.glob("*.wav"))[:3]
        else:
            files = [Path("/root/reference/samples/jfk.wav")]

    results = []
    for rep in range(args.repeats):
        for wav in files:
            r = run_one(args.model_dir, wav, args.cli_arg)
            r["repeat"] = rep
            results.append(r)
            proc_sec = (r["encoder_ms"] + r["decoder_ms"]) / 1000.0
            rtf = proc_sec / r["audio_sec"] if r["audio_sec"] else 0
            print(f"  {wav.name}: {r['audio_sec']:.1f}s audio, "
                  f"{r['steps']} steps @ {r['step_ms']:.1f} ms/step, "
                  f"enc {r['encoder_ms']} ms, RTF {rtf:.4f}", file=sys.stderr)

    total_audio = sum(r["audio_sec"] for r in results)
    total_proc = sum(r["encoder_ms"] + r["decoder_ms"] for r in results) / 1000
    total_steps = sum(r["steps"] for r in results)
    w_step = sum(r["step_ms"] * r["steps"] for r in results) / max(total_steps, 1)
    short = [r["step_ms"] for r in results if r["audio_sec"] < 60]
    long_ = [r["step_ms"] for r in results if r["audio_sec"] >= 60]
    print("\n=== Summary ===")
    print(f"overall_rtf         {total_proc / total_audio:.4f}  "
          f"({total_audio / max(total_proc, 1e-9):.2f}x realtime)")
    print(f"weighted_step_ms    {w_step:.2f}  ({1000.0 / max(w_step, 1e-9):.2f} tok/s)")
    if short:
        print(f"short_clip_step_ms  {statistics.mean(short):.2f}")
    if long_:
        print(f"long_clip_step_ms   {statistics.mean(long_):.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
