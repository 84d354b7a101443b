#!/bin/bash
# One-shot round-5 TPU capture (VERDICT r4 item 3): the full bench AND
# the parity report in ONE session, so every round leaves both artifacts
# even through outages. Run UNSCRUBBED (axon plugin active) as the SOLE
# TPU user. Usage: bash tools/capture_r5.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r5_capture}
mkdir -p "$OUT" docs/captures
STAMP=$(date +%Y%m%d_%H%M%S)

echo "[capture] bench starting at $STAMP (~20-40 min)" >&2
# generous probe/deadline defaults: during a flaky tunnel recovery the
# capture should keep retrying instead of giving up in 15 min
BENCH_PROBE_WINDOW_S=${BENCH_PROBE_WINDOW_S:-7200} \
BENCH_PROBE_RETRY_S=${BENCH_PROBE_RETRY_S:-120} \
BENCH_DEADLINE_S=${BENCH_DEADLINE_S:-10800} \
BENCH_SIDECAR="$OUT/bench_full_$STAMP.json" \
python bench.py >"$OUT/bench_$STAMP.json" 2>"$OUT/bench_$STAMP.log"
RC=$?
echo "[capture] bench rc=$RC; stdout line:" >&2
cat "$OUT/bench_$STAMP.json" >&2
echo >&2

# land the bench artifacts where the judge looks (slim stdout line,
# full sidecar, gzipped stderr log)
cp "$OUT/bench_$STAMP.json" "docs/captures/bench_r5_$STAMP.json"
[ -f "$OUT/bench_full_$STAMP.json" ] && \
    cp "$OUT/bench_full_$STAMP.json" "docs/captures/bench_r5_full_$STAMP.json"
gzip -c "$OUT/bench_$STAMP.log" > "docs/captures/bench_r5_$STAMP.log.gz"

echo "[capture] parity report --full (per-frame f64 oracle; this is" >&2
echo "[capture] host-bound and can take ~30-60 min)" >&2
python tools/parity_report.py r05 --full 2>"$OUT/parity_$STAMP.log"
RC2=$?
echo "[capture] parity rc=$RC2 -> PARITY_r05.json" >&2
tail -5 "$OUT/parity_$STAMP.log" >&2

echo "[capture] done: bench rc=$RC parity rc=$RC2" >&2
exit $(( RC != 0 || RC2 != 0 ? 1 : 0 ))
