#!/bin/bash
# Round-5 official measurement program, run back-to-back on one
# regime-ok day, serialized through tpu_run.sh (VERDICT r4 items 2, 3, 8):
#   0. precision gate (tpu_parity_check)
#   1. official tier set (headline exact / high / fast / kwta) + rate sweep
#   2. the serving capacity table as ONE epoch-interleaved invocation
#      ({64,128,256,512} x {f32,f16,int8} x D{1,2})
#   3. the off-grid attribution probes (gather decomposition + fix shootout)
# Usage: tools/r05_measure.sh [outdir]   (default /tmp/r05)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r05}
mkdir -p "$OUT"
S="$OUT/summary.txt"
run() { # run <tag> <script...>
  local tag=$1; shift
  echo "=== $tag $(date -u +%H:%M:%S) ===" | tee -a "$S"
  timeout 3000 tools/tpu_run.sh "$OUT/$tag.log" "$@"
  local rc=$?
  grep -E '^\{' "$OUT/$tag.log" | tail -40 >> "$S"
  [ $rc -ne 0 ] && echo "(rc=$rc)" | tee -a "$S"
}

run parity tools/tpu_parity_check.py

run bench_headline bench.py
run bench_high bench.py --precision high
run bench_fast bench.py --fast
run bench_kwta bench.py --kwta
run bench_44k1 bench.py --rate 44100
run bench_48k bench.py --rate 48000
run bench_32k bench.py --rate 32000
run bench_22k bench.py --rate 22050
run bench_8k bench.py --rate 8000

run capacity tools/bench_online.py --capacity-table

run offgrid_gather tools/probe_offgrid_gather.py
run offgrid_fix tools/probe_offgrid_fix.py

echo "=== done $(date -u +%H:%M:%S) ===" | tee -a "$S"
