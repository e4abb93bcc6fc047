#!/usr/bin/env python
"""bf16 vs int8 transcript A/B at full size through the real loader.

The --int8 CLI flag (weight-only int8 decoder, models/quant.py) warns that
transcripts may differ from bf16 on near-tied tokens; this tool measures
that delta on a real clip: one checkpoint load, two engines sharing the
unquantized leaves, token-level diff of the two transcripts.  The analog of
the reference's dtype-ladder discipline (SPEED.md's fp16-vs-f32 checks).

Usage: python tools/int8_ab.py [model_dir] [wav_path]
Set AB_BITS=4 to A/B the int4 rung instead of int8.
Set AB_KV=float8_e4m3fn to A/B the fp8 DECODER-KV rung instead (weights
stay exact bf16 in both engines — isolates the KV-storage term).
Prints the token counts, the number of differing positions, and the first
few diffs; exit 0 always (the delta is a measurement, not a pass/fail).
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def log(msg):
    print(f"[int8ab] {msg}", file=sys.stderr, flush=True)


def main():
    model_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "VOXTRAL_MODEL_DIR", "/root/ckpt-fake"
    )
    wav = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/reference/samples/jfk.wav"

    import jax

    from voxtral_tpu.config import full_config
    from voxtral_tpu.io.wav import load_wav
    from voxtral_tpu.models.params import load_params
    from voxtral_tpu.runtime.engine import VoxtralEngine, adaptive_dec_ring
    from voxtral_tpu.runtime.stream import transcribe_tokens
    from voxtral_tpu.tokenizer import TekkenTokenizer

    cfg = full_config()
    log(f"device: {jax.devices()[0]}")
    samples = load_wav(wav)
    log(f"{wav}: {len(samples) / 16000:.1f}s")

    t0 = time.monotonic()
    params = load_params(model_dir, cfg, verbose=True)
    tok = TekkenTokenizer.load(os.path.join(model_dir, "tekken.json"))
    log(f"weights in HBM (+{time.monotonic() - t0:.0f}s)")

    kw = dict(buckets=(64, 16, 4, 1),
              dec_kv_ring=adaptive_dec_ring(cfg, len(samples)))

    eng = VoxtralEngine(cfg, params, tokenizer=tok, **kw)
    t0 = time.monotonic()
    toks16 = transcribe_tokens(eng, samples)
    log(f"bf16: {len(toks16)} text tokens (+{time.monotonic() - t0:.0f}s)")
    del eng

    ab_kv = os.environ.get("AB_KV")
    if ab_kv:
        qmode = f"kv:{ab_kv}"
        cfg_kv = cfg.replace(kv_dtype=ab_kv, enc_kv_dtype=cfg.kv_dtype)
        eng8 = VoxtralEngine(cfg_kv, params, tokenizer=tok, **kw)
        del params
    else:
        qmode = "int4" if os.environ.get("AB_BITS") == "4" else "int8"
        eng8 = VoxtralEngine(cfg, params, tokenizer=tok, quantize=qmode, **kw)
        del params  # free the bf16 copies of the quantized matrices
    t0 = time.monotonic()
    toks8 = transcribe_tokens(eng8, samples)
    log(f"{qmode}: {len(toks8)} text tokens (+{time.monotonic() - t0:.0f}s)")

    n = max(len(toks16), len(toks8))
    diffs = [
        (i,
         toks16[i] if i < len(toks16) else "<end>",
         toks8[i] if i < len(toks8) else "<end>")
        for i in range(n)
        if (toks16[i] if i < len(toks16) else None)
        != (toks8[i] if i < len(toks8) else None)
    ]
    print(f"QUANT-AB: bf16 {len(toks16)} tokens, {qmode} {len(toks8)} tokens, "
          f"{len(diffs)}/{n} positions differ "
          f"({100.0 * (1 - len(diffs) / max(1, n)):.1f}% identical)")
    for i, a, b in diffs[:10]:
        print(f"  @ {i}: bf16 {a!r} vs {qmode} {b!r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
