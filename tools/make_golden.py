#!/usr/bin/env python
"""Record/replay fidelity fixtures (closes the runtest.sh parity gap).

The reference's regression discipline is token-for-token stability against a
golden corpus (runtest.sh:27-39, samples/benchmark/night1968/*.txt).  This
environment has no real checkpoint, so parity against the C reference cannot
be *verified* here — but it can be made MECHANICAL for anyone who has one:

  record   run THIS engine on wav files and write token-ID + text fixtures
  ingest   capture the C reference's stdout transcript as a text fixture
  check    re-run the engine and compare against the stored fixtures
           (exact token IDs for engine fixtures, text for reference ones);
           --quant int8/int4 prints a measured transcript-delta report
           against the bf16 fixture instead of an extrapolated claim

Usage (on a machine with the checkpoint):
  python tools/make_golden.py record -d voxtral-model samples/jfk.wav
  ./voxtral -d voxtral-model -i samples/jfk.wav > /tmp/ref.txt
  python tools/make_golden.py ingest --name jfk --text-file /tmp/ref.txt
  python tools/make_golden.py check  -d voxtral-model
  python tools/make_golden.py check  -d voxtral-model --quant int4

Fixtures are one JSON file per (clip, engine, quant) under
tests/fixtures/golden/ and are meant to be committed.
"""

from __future__ import annotations

import argparse
import difflib
import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DEFAULT_FIXDIR = os.path.join(REPO, "tests", "fixtures", "golden")


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def weights_fingerprint(model_dir: str) -> str:
    """Cheap checkpoint-identity hash: file size + the first 4 MiB of every
    *.safetensors in the dir (tensor DATA, not just the layout header —
    synthetic and real checkpoints share shapes).  Engine fixtures carry
    this so `check` never compares exact token IDs recorded on one
    checkpoint against transcripts from another (the round-4 failure mode:
    synthetic-checkpoint fixtures hard-FAILing a real-checkpoint
    runtest.sh, ADVICE r4)."""
    import glob as _glob

    h = hashlib.sha256()
    for path in sorted(_glob.glob(os.path.join(model_dir, "*.safetensors"))):
        h.update(os.path.basename(path).encode())
        h.update(str(os.path.getsize(path)).encode())
        with open(path, "rb") as f:
            h.update(f.read(4 << 20))
    return h.hexdigest()


def _fixture_path(fixdir: str, name: str, engine: str, quant: str) -> str:
    suffix = "" if quant == "bf16" else f".{quant}"
    return os.path.join(fixdir, f"{name}.{engine}{suffix}.json")


def _load_engine(model_dir: str, quant: str):
    from voxtral_tpu.config import full_config
    from voxtral_tpu.models.params import load_params
    from voxtral_tpu.runtime.engine import VoxtralEngine, adaptive_dec_ring
    from voxtral_tpu.tokenizer import TekkenTokenizer

    cfg = full_config()
    params = load_params(model_dir, cfg)
    tok = TekkenTokenizer.load(os.path.join(model_dir, "tekken.json"))
    return VoxtralEngine(
        cfg, params, tokenizer=tok,
        quantize=quant if quant != "bf16" else False,
        dec_kv_ring=adaptive_dec_ring(cfg, 16000 * 120),
    )


def _transcribe(engine, wav: str):
    """Returns (token_ids, text) for one clip via the streaming state
    machine (the same path runtest.sh exercises)."""
    from voxtral_tpu.io.wav import load_wav
    from voxtral_tpu.runtime.stream import VoxStream

    s = VoxStream(engine)
    s.record_ids = True
    s.feed(load_wav(wav))
    s.finish()
    text = "".join(s.get()).strip()
    return s.generated_ids, text


def cmd_record(args) -> int:
    os.makedirs(args.fixtures, exist_ok=True)
    engine = _load_engine(args.model_dir, args.quant)
    for wav in args.files:
        name = args.name or os.path.splitext(os.path.basename(wav))[0]
        ids, text = _transcribe(engine, wav)
        path = _fixture_path(args.fixtures, name, "engine", args.quant)
        with open(path, "w") as f:
            json.dump(
                {
                    "name": name,
                    "audio_sha256": _sha256(wav),
                    "weights_fingerprint": weights_fingerprint(
                        args.model_dir),
                    "engine": "voxtral_tpu",
                    "quant": args.quant,
                    "token_ids": ids,
                    "text": text,
                },
                f,
            )
        print(f"wrote {path} ({len(ids)} tokens, {len(text)} chars)")
    return 0


def cmd_ingest(args) -> int:
    """Capture the C reference's transcript (its stdout) as a text fixture —
    the reference prints text only, so the comparison granularity is text."""
    os.makedirs(args.fixtures, exist_ok=True)
    text = (
        open(args.text_file).read() if args.text_file else sys.stdin.read()
    ).strip()
    path = _fixture_path(args.fixtures, args.name, "reference", "bf16")
    with open(path, "w") as f:
        json.dump(
            {
                "name": args.name,
                "engine": "reference",
                "quant": "bf16",
                "token_ids": None,
                "text": text,
            },
            f,
        )
    print(f"wrote {path} ({len(text)} chars)")
    return 0


def _delta_report(name: str, base: str, other: str, label: str):
    sm = difflib.SequenceMatcher(a=base.split(), b=other.split())
    ratio = sm.ratio()
    print(f"  {name}: {label} word-level similarity {ratio:.1%}")
    for tag, i1, i2, j1, j2 in sm.get_opcodes():
        if tag != "equal":
            print(
                f"    {tag}: {' '.join(base.split()[i1:i2])!r} -> "
                f"{' '.join(other.split()[j1:j2])!r}"
            )
    return ratio


def cmd_check(args) -> int:
    import glob as _glob

    fixtures = sorted(_glob.glob(os.path.join(args.fixtures, "*.json")))
    if args.names:
        fixtures = [
            p for p in fixtures
            if any(os.path.basename(p).startswith(n + ".") for n in args.names)
        ]
    if not fixtures:
        print(
            f"SKIP: no fixtures under {args.fixtures} — generate them with "
            f"'make_golden.py record' (this engine) and/or "
            f"'make_golden.py ingest' (the C reference's stdout) on a "
            f"machine with the checkpoint"
        )
        return 0

    engine = None
    fp = weights_fingerprint(args.model_dir)
    fails = 0
    done: dict[str, tuple] = {}          # clip name -> (ids, text) this run
    for path in fixtures:
        fx = json.load(open(path))
        name = fx["name"]
        # engine fixtures are exact token-ID regressions, valid ONLY against
        # the checkpoint that recorded them — skip on mismatch rather than
        # hard-FAIL someone else's checkpoint (ADVICE r4)
        fx_fp = fx.get("weights_fingerprint")
        if fx_fp is not None and fx_fp != fp:
            print(f"SKIP {os.path.basename(path)}: recorded on a different "
                  f"checkpoint ({fx_fp[:12]}... vs {fp[:12]}...) — re-record "
                  f"with 'make_golden.py record'")
            continue
        wav = args.wav_dir and os.path.join(args.wav_dir, name + ".wav")
        if not wav or not os.path.exists(wav):
            print(f"SKIP {os.path.basename(path)}: no {name}.wav under "
                  f"--wav-dir")
            continue
        # the fixture's token IDs belong to ONE exact clip: verify the wav
        # we are about to transcribe is that clip (a renamed/wrong-content
        # wav would otherwise report a misleading FAIL, ADVICE r4)
        fx_audio = fx.get("audio_sha256")
        if fx_audio is not None and _sha256(wav) != fx_audio:
            print(f"SKIP {os.path.basename(path)}: {name}.wav content does "
                  f"not match the fixture's audio_sha256")
            continue
        if name not in done:
            if engine is None:
                engine = _load_engine(args.model_dir, args.quant)
            done[name] = _transcribe(engine, wav)
        ids, text = done[name]

        if fx["quant"] == args.quant and fx.get("token_ids") is not None:
            # same configuration: exact token-ID regression check
            ref_ids = fx["token_ids"]
            n = sum(a == b for a, b in zip(ids, ref_ids))
            ok = ids == ref_ids
            print(f"{'OK  ' if ok else 'FAIL'} {os.path.basename(path)}: "
                  f"{n}/{len(ref_ids)} token IDs match")
            fails += 0 if ok else 1
        else:
            # cross-config (reference text, or quant-vs-bf16): delta report
            label = f"{fx['engine']}/{fx['quant']} vs engine/{args.quant}"
            ratio = _delta_report(os.path.basename(path), fx["text"], text,
                                  label)
            if fx["engine"] == "reference" and args.quant == "bf16" \
                    and ratio < args.min_ratio:
                print(f"FAIL {os.path.basename(path)}: similarity "
                      f"{ratio:.1%} < {args.min_ratio:.0%}")
                fails += 1
    if fails:
        print(f"{fails} fixture comparison(s) FAILED")
        return 1
    print("all fixture comparisons passed")
    return 0


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    rec = sub.add_parser("record")
    rec.add_argument("-d", "--model-dir", required=True)
    rec.add_argument("--quant", choices=("bf16", "int8", "int4"),
                     default="bf16")
    rec.add_argument("--name", help="fixture name (default: wav basename)")
    rec.add_argument("--fixtures", default=DEFAULT_FIXDIR)
    rec.add_argument("files", nargs="+")
    rec.set_defaults(fn=cmd_record)

    ing = sub.add_parser("ingest")
    ing.add_argument("--name", required=True)
    ing.add_argument("--text-file", help="reference stdout (default: stdin)")
    ing.add_argument("--fixtures", default=DEFAULT_FIXDIR)
    ing.set_defaults(fn=cmd_ingest)

    chk = sub.add_parser("check")
    chk.add_argument("-d", "--model-dir", required=True)
    chk.add_argument("--quant", choices=("bf16", "int8", "int4"),
                     default="bf16")
    chk.add_argument("--fixtures", default=DEFAULT_FIXDIR)
    chk.add_argument("--wav-dir", default=None,
                     help="directory holding <name>.wav for each fixture")
    chk.add_argument("--min-ratio", type=float, default=0.9,
                     help="min word similarity vs a reference text fixture")
    chk.add_argument("names", nargs="*")
    chk.set_defaults(fn=cmd_check)

    args = p.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
