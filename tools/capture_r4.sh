#!/bin/bash
# One-shot round-4 TPU capture: run the full bench (sole TPU user!) and
# save the JSON + stderr log with timestamps. Run UNSCRUBBED so the axon
# plugin is active. Usage: bash tools/capture_r4.sh [outdir]
set -u
OUT=${1:-/tmp/r4_capture}
mkdir -p "$OUT"
STAMP=$(date +%Y%m%d_%H%M%S)
echo "[capture] bench starting at $STAMP (this takes ~20-40 min)" >&2
# generous probe/deadline defaults: during a flaky tunnel recovery the
# capture should keep retrying instead of giving up in 15 min
BENCH_PROBE_WINDOW_S=${BENCH_PROBE_WINDOW_S:-7200} \
BENCH_PROBE_RETRY_S=${BENCH_PROBE_RETRY_S:-120} \
BENCH_DEADLINE_S=${BENCH_DEADLINE_S:-10800} \
python bench.py >"$OUT/bench_$STAMP.json" 2>"$OUT/bench_$STAMP.log"
RC=$?
echo "[capture] bench rc=$RC" >&2
tail -c 2000 "$OUT/bench_$STAMP.json" >&2
echo >&2
echo "[capture] done: $OUT/bench_$STAMP.json" >&2
