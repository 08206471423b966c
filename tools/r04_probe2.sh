#!/bin/bash
# Round-4 probe batch 2: pin the dispatch-rule terms that batch 1 left
# with a single measured point (BENCH_NOTES_r04.md).
#   - J=1 (step >= win): batch 1 measured frames -30% vs conv at 16 kHz
#     20/20 ms (320x320); second + third points: 32 kHz 20/20 (640x640)
#     and step>win 12.5/15 (200x240).
#   - high overlap (J >= 4..5): batch 1 measured windowed -16% vs conv at
#     16 kHz 25/5 (400x80, J=5); more points: 8 kHz 25/5 (200x40),
#     32 kHz 25/5 (800x160, also win>512), 16 kHz 20/5 (320x80, J=4)
#     and the extreme 25/2.5 (400x40, J=10).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r04}
mkdir -p "$OUT"
S="$OUT/summary2.txt"
run() {
  local tag=$1; shift
  echo "=== $tag $(date -u +%H:%M:%S) ===" | tee -a "$S"
  timeout 3000 tools/tpu_run.sh "$OUT/$tag.log" "$@"
  local rc=$?
  grep -E '^\{' "$OUT/$tag.log" | tail -20 >> "$S"
  [ $rc -ne 0 ] && echo "(rc=$rc)" | tee -a "$S"
}

run p2_32k_20_20  tools/bench_pallas.py --rate 32000 --win-ms 20 --step-ms 20
run p2_12p5_15    tools/bench_pallas.py --win-ms 12.5 --step-ms 15
run p2_8k_25_5    tools/bench_pallas.py --rate 8000 --win-ms 25 --step-ms 5
run p2_32k_25_5   tools/bench_pallas.py --rate 32000 --win-ms 25 --step-ms 5
run p2_20_5       tools/bench_pallas.py --win-ms 20 --step-ms 5
run p2_25_2p5     tools/bench_pallas.py --win-ms 25 --step-ms 2.5

echo "PROBE2 DONE $(date -u +%H:%M:%S)" | tee -a "$S"
