#!/bin/bash
# Round-4 probe batch 5: the per-segment uniform frontend at 22.05 kHz
# (stride 2205 % step 221 != 0 used to force the gather fallback for every
# spectrum method -- the 4-way ~11.95 ms tie). Measures the shoot-out and
# the official bench row on the new path, plus the 16 kHz parity gate.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r04}
mkdir -p "$OUT"
S="$OUT/summary5.txt"
run() {
  local tag=$1; shift
  echo "=== $tag $(date -u +%H:%M:%S) ===" | tee -a "$S"
  timeout 3000 tools/tpu_run.sh "$OUT/$tag.log" "$@"
  local rc=$?
  grep -E '^\{' "$OUT/$tag.log" | tail -20 >> "$S"
  [ $rc -ne 0 ] && echo "(rc=$rc)" | tee -a "$S"
}

run p5_parity tools/tpu_parity_check.py
run p5_22k_shoot tools/bench_pallas.py --rate 22050
run p5_22k_official bench.py --rate 22050 --batch 256

echo "PROBE5 DONE $(date -u +%H:%M:%S)" | tee -a "$S"
