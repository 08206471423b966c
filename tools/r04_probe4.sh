#!/bin/bash
# Round-4 probe batch 4: second + third pins for the rule-v3 term
# "J>=4 AND win>512 -> windowed" (batch 2/3 pinned it only at 32 kHz
# 800x160, where windowed==conv but both beat frames by 12%).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r04}
mkdir -p "$OUT"
S="$OUT/summary4.txt"
run() {
  local tag=$1; shift
  echo "=== $tag $(date -u +%H:%M:%S) ===" | tee -a "$S"
  timeout 3000 tools/tpu_run.sh "$OUT/$tag.log" "$@"
  local rc=$?
  grep -E '^\{' "$OUT/$tag.log" | tail -20 >> "$S"
  [ $rc -ne 0 ] && echo "(rc=$rc)" | tee -a "$S"
}

run p4_48k_25_5 tools/bench_pallas.py --rate 48000 --win-ms 25 --step-ms 5
run p4_32k_20_5 tools/bench_pallas.py --rate 32000 --win-ms 20 --step-ms 5

echo "PROBE4 DONE $(date -u +%H:%M:%S)" | tee -a "$S"
