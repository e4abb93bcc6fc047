"""CLI with the reference's flag surface (main.c:27-42, 128-172):

  voxtral-tpu -d <model_dir> (-i file.wav | --stdin | --from-mic)
              [-I seconds] [--alt cutoff] [--delay ms]
              [--monitor] [--debug] [--silent]

Tokens stream to stdout as they are generated; metrics/diagnostics go to
stderr in the reference's formats so benchmark tooling parses both engines.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

import numpy as np


def _drain(stream, state, alt_mode: bool):
    """Print pending tokens; strips leading whitespace from the very first
    token and renders [best|alt...] groups in alt mode (main.c:48-104)."""
    if alt_mode:
        groups = stream.get_alt()
        for g in groups:
            alts = [a for a in g if a]
            if not state["any"]:
                alts[0] = alts[0].lstrip()
                if not alts[0]:
                    continue
                state["any"] = True
            if len(alts) > 1:
                sys.stdout.write("[" + "|".join(alts) + "]")
            else:
                sys.stdout.write(alts[0])
        sys.stdout.flush()
        return
    for tok in stream.get():
        if not state["any"]:
            tok = tok.lstrip()
            if not tok:
                continue
            state["any"] = True
        sys.stdout.write(tok)
    sys.stdout.flush()


def main(argv=None):
    p = argparse.ArgumentParser(prog="voxtral-tpu", description=__doc__)
    p.add_argument("-d", "--model-dir", required=True)
    p.add_argument("-i", "--input", help="WAV file to transcribe")
    p.add_argument("--stdin", action="store_true", help="read WAV or raw s16le 16kHz mono PCM from stdin")
    p.add_argument("--from-mic", action="store_true", help="capture from the default mic (needs arecord or ffmpeg)")
    p.add_argument("-I", "--interval", type=float, default=None, help="processing interval seconds")
    p.add_argument("--alt", type=float, default=None, metavar="CUTOFF", help="emit alternative tokens within CUTOFF")
    p.add_argument("--delay", type=int, default=None, metavar="MS", help="transcription delay 80..2400 ms")
    p.add_argument("--monitor", action="store_true")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--silent", action="store_true")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="write a jax.profiler trace of the run to DIR")
    p.add_argument("--bulk-encode", action="store_true",
                   help="offline -i only: whole-clip no-ring batch encoder "
                        "(vox_encoder_forward analog) — fastest file "
                        "transcription, skips streaming warm-up; transcripts "
                        "can differ from the streaming path on near-tied "
                        "tokens")
    p.add_argument("--jacobi", action="store_true",
                   help="force Jacobi fixpoint decoding for ALL bursts: "
                        "measured 1.3-15x faster single-stream "
                        "(docs/PERF.md); greedy-exact up to rare bf16 "
                        "near-tie argmax flips.  Default is AUTO: Jacobi "
                        "for window-sized offline/backlog bursts, "
                        "sequential for short streaming bursts")
    p.add_argument("--no-jacobi", action="store_true",
                   help="force sequential decoding for all bursts "
                        "(disables the auto Jacobi policy)")
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only decoder quantization: ~2x decode "
                        "throughput, but transcripts may differ from bf16 on "
                        "near-tied tokens")
    p.add_argument("--int4", action="store_true",
                   help="int4 (group-128 scales) weight-only decoder "
                        "quantization: max decode throughput, larger "
                        "transcript deviation than --int8")
    p.add_argument("--compile-cache", metavar="DIR",
                   default=os.environ.get(
                       "VOXTRAL_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/voxtral_tpu/jax"),
                   ),
                   help="persistent XLA compile cache directory (the warm-up "
                        "compiles once per machine instead of once per run); "
                        "default %(default)s")
    p.add_argument("--no-compile-cache", action="store_true",
                   help="disable the persistent compile cache")
    args = p.parse_args(argv)

    if not args.no_compile_cache and args.compile_cache:
        # must be set before the first compile; the Metal analog re-converts
        # 8.4 GB at every start (voxtral.c:163-250) — here warm-up compiles
        # persist across processes
        import jax

        os.makedirs(args.compile_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from .config import SAMPLE_RATE, STREAM_DEFAULT_INTERVAL_S, full_config
    from .io.wav import load_wav, parse_wav_bytes, resample_linear
    from .models.params import load_params
    from .runtime import stream as stream_mod
    from .runtime.engine import VoxtralEngine, adaptive_dec_ring
    from .runtime.stream import VoxStream
    from .tokenizer import TekkenTokenizer

    stream_mod.verbose = 0 if args.silent else (2 if args.debug else 1)
    stream_mod.monitor = args.monitor
    v = stream_mod.verbose

    if args.from_mic:
        # fail fast before the (long) model load if no capture backend exists
        from shutil import which

        if not (which("arecord") or which("ffmpeg")):
            print("No mic capture backend (arecord/ffmpeg) available",
                  file=sys.stderr)
            return 1

    cfg = full_config()
    # VOX_DECODER_KV_FP16 analog (voxtral.c:166-167): KV cache storage dtype
    kv_env = os.environ.get("VOXTRAL_KV_DTYPE")
    if kv_env:
        cfg = cfg.replace(kv_dtype=kv_env)

    # Read the input up front when its length is knowable so the decoder KV
    # ring can be sized to the clip (smaller ring => less attention traffic).
    samples = None
    stdin_head = None
    if args.input:
        samples = load_wav(args.input)
    elif args.stdin:
        stdin_head = sys.stdin.buffer.read(4)
        if stdin_head == b"RIFF":
            data = stdin_head + sys.stdin.buffer.read()
            raw, rate = parse_wav_bytes(data)
            samples = resample_linear(raw, rate, SAMPLE_RATE)
            stdin_head = None
    if samples is not None:
        dec_ring = adaptive_dec_ring(cfg, len(samples))
    else:
        dec_ring = 2048  # live mode restarts at STREAM_MAX_DECODE_KV=2000

    t0 = time.monotonic()
    if v:
        print(f"Loading model from {args.model_dir}", file=sys.stderr)
    params = load_params(args.model_dir, cfg, verbose=v >= 2)
    tok = TekkenTokenizer.load(os.path.join(args.model_dir, "tekken.json"))
    # streaming bursts are bounded by the processing interval (~25 tokens at
    # the 2 s default), so the 256-bucket's big scan program is not needed
    engine = VoxtralEngine(
        cfg, params, tokenizer=tok, dec_kv_ring=dec_ring,
        buckets=(64, 16, 4, 1),
        decode_mode=("jacobi" if args.jacobi
                     else "sequential" if args.no_jacobi else "auto"),
        quantize="int4" if args.int4 else args.int8,
    )
    if args.delay is not None:
        engine.set_delay(args.delay)
    if v:
        print(f"Model loaded in {time.monotonic() - t0:.1f}s", file=sys.stderr)
        # HBM ledger at startup (the reference's "Metal GPU memory used"
        # line, voxtral.c:247-249) — shape-derived, since the axon backend
        # has no device.memory_stats()
        led = engine.memory_ledger()
        gib = 1 << 30
        print(
            f"HBM: {led['params_total'] / gib:.2f} GiB weights resident; "
            f"KV caches {led['dec_cache_bytes_per_stream'] / (1 << 20):.0f} "
            f"(dec ring {engine.dec_kv_ring}) + "
            f"{led['enc_cache_bytes_per_stream'] / (1 << 20):.0f} MiB/stream "
            f"(enc ring {engine.enc_kv_ring})",
            file=sys.stderr,
        )

    if args.input and args.bulk_encode:
        # offline batch path: one bulk-encode program + decode bursts; no
        # streaming warm-up needed (a single run compiles each program once
        # on first use anyway)
        from .runtime.offline import transcribe_offline

        t0 = time.monotonic()
        text = transcribe_offline(engine, samples)
        sys.stdout.write(text + "\n")
        if v:
            dur = len(samples) / SAMPLE_RATE
            wall = time.monotonic() - t0
            print(f"Audio: {len(samples)} samples ({dur:.1f} seconds)",
                  file=sys.stderr)
            print(f"Offline transcription: {wall * 1000:.0f} ms "
                  f"({dur / wall:.1f}x realtime)", file=sys.stderr)
        return 0

    if v:
        print("Compiling kernels...", file=sys.stderr)
        t0 = time.monotonic()
    engine.warmup(
        n_alt=4 if args.alt is not None else 0,
        progress=(lambda m: print(f"  {m}", file=sys.stderr, flush=True))
        if v else None,
        interval_s=args.interval if args.interval is not None
        else STREAM_DEFAULT_INTERVAL_S,
    )
    if v:
        print(f"Warm-up done in {time.monotonic() - t0:.1f}s", file=sys.stderr)

    def new_stream():
        s = VoxStream(engine)
        if args.interval is not None:
            s.set_processing_interval(args.interval)
        if args.alt is not None:
            s.set_alt(4, args.alt)
        return s

    state = {"any": False}
    alt_mode = args.alt is not None

    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)
        import atexit

        atexit.register(jax.profiler.stop_trace)

    if args.input:
        if v:
            print(f"Audio: {len(samples)} samples "
                  f"({len(samples) / SAMPLE_RATE:.1f} seconds)", file=sys.stderr)
        s = new_stream()
        # 1-second chunks, draining as we go (main.c:109-118)
        for i in range(0, len(samples), SAMPLE_RATE):
            s.feed(samples[i : i + SAMPLE_RATE])
            _drain(s, state, alt_mode)
        s.finish()
        _drain(s, state, alt_mode)
        sys.stdout.write("\n")
        s.print_stats()
        return 0

    if args.stdin:
        if samples is not None:
            if v:
                print(f"Audio: {len(samples)} samples "
                      f"({len(samples) / SAMPLE_RATE:.1f} seconds)",
                      file=sys.stderr)
            s = new_stream()
            for i in range(0, len(samples), SAMPLE_RATE):
                s.feed(samples[i : i + SAMPLE_RATE])
                _drain(s, state, alt_mode)
            s.finish()
            _drain(s, state, alt_mode)
        else:
            s = new_stream()
            s.set_continuous(True)
            if stdin_head:
                s.feed(np.frombuffer(stdin_head, dtype="<i2").astype(np.float32) / 32768.0)
            while True:
                raw = sys.stdin.buffer.read(8192)
                if not raw:
                    s.finish()
                    _drain(s, state, alt_mode)
                    break
                pcm = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2")
                s.feed(pcm.astype(np.float32) / 32768.0)
                _drain(s, state, alt_mode)
        sys.stdout.write("\n")
        s.print_stats()
        return 0

    if args.from_mic:
        cmd = None
        for c in (
            ["arecord", "-q", "-f", "S16_LE", "-r", "16000", "-c", "1", "-t", "raw"],
            ["ffmpeg", "-loglevel", "quiet", "-f", "pulse", "-i", "default",
             "-ar", "16000", "-ac", "1", "-f", "s16le", "-"],
        ):
            from shutil import which
            if which(c[0]):
                cmd = c
                break
        if cmd is None:
            print("No mic capture backend (arecord/ffmpeg) available",
                  file=sys.stderr)
            return 1
        if v:
            print(f"Capturing from mic via {cmd[0]} (ctrl-c to stop)",
                  file=sys.stderr)
        s = new_stream()
        s.set_continuous(True)
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
        from .mic import MicCapture, run_mic_loop

        cap = MicCapture(proc.stdout)
        try:
            # over-buffer catch-up + silence gating + skip-feed during
            # extended silence (main.c:235-296) — see voxtral_tpu/mic.py
            run_mic_loop(s, cap, lambda: _drain(s, state, alt_mode))
        except KeyboardInterrupt:
            pass
        finally:
            proc.terminate()
        s.finish()
        _drain(s, state, alt_mode)
        sys.stdout.write("\n")
        s.print_stats()
        return 0

    p.error("one of -i, --stdin, --from-mic is required")


if __name__ == "__main__":
    sys.exit(main())
