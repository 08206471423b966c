#!/bin/bash
# Round-4 probe batch 3: windowed fast tiers at the high-overlap
# geometries (the J>=4 dispatch term was measured at exact grade only;
# conv scales ~1.55x from highest->default while frames is flat, so the
# fast-tier winner needs its own points), plus the J=1 family.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r04}
mkdir -p "$OUT"
S="$OUT/summary3.txt"
run() {
  local tag=$1; shift
  echo "=== $tag $(date -u +%H:%M:%S) ===" | tee -a "$S"
  timeout 3000 tools/tpu_run.sh "$OUT/$tag.log" "$@"
  local rc=$?
  grep -E '^\{' "$OUT/$tag.log" | tail -20 >> "$S"
  [ $rc -ne 0 ] && echo "(rc=$rc)" | tee -a "$S"
}

run p3_25_5    tools/bench_pallas.py --win-ms 25 --step-ms 5
run p3_20_5    tools/bench_pallas.py --win-ms 20 --step-ms 5
run p3_8k_25_5 tools/bench_pallas.py --rate 8000 --win-ms 25 --step-ms 5
run p3_20_20   tools/bench_pallas.py --win-ms 20 --step-ms 20

echo "PROBE3 DONE $(date -u +%H:%M:%S)" | tee -a "$S"
