#!/bin/bash
# Round-4 measurement program (VERDICT r3 items 1-5): run the full artifact
# set back-to-back on one healthy-relay day, serialized through tpu_run.sh.
# Usage: tools/r04_measure.sh [outdir]   (default /tmp/r04)
# Each step appends to $OUT/summary.txt; individual logs in $OUT/*.log.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r04}
mkdir -p "$OUT"
S="$OUT/summary.txt"
run() { # run <tag> <script...>
  local tag=$1; shift
  echo "=== $tag $(date -u +%H:%M:%S) ===" | tee -a "$S"
  timeout 3000 tools/tpu_run.sh "$OUT/$tag.log" "$@"
  local rc=$?
  grep -E '^\{' "$OUT/$tag.log" | tail -20 >> "$S"
  [ $rc -ne 0 ] && echo "(rc=$rc)" | tee -a "$S"
}

# 0. precision gate first: exact-f32 TPU==CPU bit parity (also required
#    because round 4 touched contraction code: the factored frontend)
run parity tools/tpu_parity_check.py

# 1. official artifact set (VERDICT #1): headline exact, high, fast, kwta,
#    and the large-window rows
run bench_headline bench.py
run bench_high bench.py --precision high
run bench_fast bench.py --fast
run bench_kwta bench.py --kwta
run bench_44k1 bench.py --rate 44100
run bench_48k bench.py --rate 48000
run bench_32k bench.py --rate 32000
run bench_22k bench.py --rate 22050
# factored end-to-end rows at the geometries where the roofline predicts
# wins (tools/roofline.py: 16k 1.9->1.06 ms, 32k 6.7->2.1, 48k 14.3->3.2)
run bench_16k_fact bench.py --frontend factored
run bench_48k_fact bench.py --rate 48000 --frontend factored
run bench_32k_fact bench.py --rate 32000 --frontend factored
run bench_22k_fact bench.py --rate 22050 --frontend factored
# windowed (single dense GEMM over materialized windows): the only
# candidate ahead of frames at the prime 44.1 kHz window (-17% FLOPs)
run bench_44k1_win bench.py --rate 44100 --frontend windowed

# 2. frontend shoot-outs incl. the new factored rows (VERDICT #3) at the
#    geometries with a plan, plus the off-family dispatch probes (#2)
run shoot_16k tools/bench_pallas.py
run shoot_48k tools/bench_pallas.py --rate 48000
run shoot_32k tools/bench_pallas.py --rate 32000
run shoot_22k tools/bench_pallas.py --rate 22050
run shoot_8k tools/bench_pallas.py --rate 8000
# alternate factored splits: validate the plan cost model's ranking on
# real hardware (model picks 16k 100x4, 32k 100x8, 48k 75x16; alternates
# stress stage-2 contraction size and the windowed mode)
run split_16k tools/bench_pallas.py --factored-splits 25x16,80x5,8x50
run split_48k tools/bench_pallas.py --rate 48000 \
  --factored-splits 24x50,120x10,16x75,48x25
run split_32k tools/bench_pallas.py --rate 32000 \
  --factored-splits 32x25,25x32,50x16
# off-family probes: win=step (J=1), 25/5 (J=5), 12.5/10 (J=1.25), plus a
# misaligned-stride small-window point (step 100: gcd(100,128)=4 < 16,
# win 200 <= 512 -- rule v2's two terms disagree there)
run off_20_20 tools/bench_pallas.py --win-ms 20 --step-ms 20
run off_25_5 tools/bench_pallas.py --win-ms 25 --step-ms 5
run off_12p5_10 tools/bench_pallas.py --win-ms 12.5 --step-ms 10
run off_odd_small tools/bench_pallas.py --win-ms 12.5 --step-ms 6.25

# 3. serving p99 + canary attribution (VERDICT #5)
run online_128 tools/bench_online.py --streams 128 --f16 --outputs features --overload --chunks 200

# 4. corpus: honest pre-pad RTF re-measure (VERDICT #4b) and the
#    byte-bound transfer regime at 44.1 kHz power outputs (#4a)
run corpus_std tools/bench_corpus.py --files 400 --runs 3
run corpus_bb_f32 tools/bench_corpus.py --files 120 --rate 44100 \
  --save-keys power_segment,log_power_segment --runs 2 \
  --corpus-dir /tmp/bc44bb --out-dir /tmp/bc44bb_out --transfer float32
run corpus_bb_f16 tools/bench_corpus.py --files 120 --rate 44100 \
  --save-keys power_segment,log_power_segment --runs 2 \
  --corpus-dir /tmp/bc44bb --out-dir /tmp/bc44bb_out --f16
run corpus_bb_int8 tools/bench_corpus.py --files 120 --rate 44100 \
  --save-keys power_segment,log_power_segment --runs 2 \
  --corpus-dir /tmp/bc44bb --out-dir /tmp/bc44bb_out --int8

echo "ALL DONE $(date -u +%H:%M:%S)" | tee -a "$S"
