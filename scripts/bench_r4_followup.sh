#!/bin/bash
# Round-4 follow-up battery (after bench_r4_retry.sh's conv matrix):
# XLA conv baselines at the small batches (crossover retune data), the
# sampling-tail A/B under the fixed 6D-block kernel, the train-step
# matrix, the headline bench, and the 2D full-res run under the
# parity-quilt stitch.
# Usage: bench_r4_followup.sh [outdir]
set -u
OUT=${1:-/tmp/bench_r4f}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, cmd...
  local name=$1; shift
  echo "=== $name"
  timeout 1200 "$@" 2>&1 | grep -v "cpu_aot\|E08\|experimental" \
    | tee "$OUT/$name.log" | tail -8
}

run convs_b16_xla python scripts/bench_convs.py 16 --xla-only
run convs_b8_xla python scripts/bench_convs.py 8 --xla-only
run sampling_b32 python scripts/bench_sampling.py 32
run sampling_b8 python scripts/bench_sampling.py 8
run train_step python scripts/bench_train_step.py
run train_micro python scripts/bench_train_micro.py
run bench python bench.py
run 2d_fullres python scripts/bench_2d_fullres.py
echo "followup done -> $OUT"
