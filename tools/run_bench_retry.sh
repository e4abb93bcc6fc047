#!/usr/bin/env bash
# Run bench.py with a stall watchdog: the remote-TPU tunnel in this
# environment occasionally drops an RPC, wedging the client forever.  Restart
# the bench when its output goes stale; keep the first successful JSON line.
# Usage: run_bench_retry.sh [out_file] [attempts] [stall_secs]
set -u
OUT="${1:-/tmp/bench_final.out}"
ATTEMPTS="${2:-6}"
STALL="${3:-480}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"

for a in $(seq 1 "$ATTEMPTS"); do
  echo "[bench-retry] attempt $a" >&2
  : > "$OUT"
  python "$REPO/bench.py" >> "$OUT" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    now=$(date +%s)
    mtime=$(stat -c %Y "$OUT")
    if (( now - mtime > STALL )); then
      echo "[bench-retry] stalled ${STALL}s; killing $PID" >&2
      kill -9 "$PID" 2>/dev/null
      sleep 5
      break
    fi
  done
  wait "$PID" 2>/dev/null
  if grep -q '"metric"' "$OUT"; then
    grep '"metric"' "$OUT" | tail -1
    exit 0
  fi
  echo "[bench-retry] attempt $a did not produce a result; cooling down 60s" >&2
  sleep 60
done
echo "[bench-retry] all attempts failed" >&2
exit 1
