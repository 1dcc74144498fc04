#!/bin/bash
# Round-4 conv-matrix re-run: the first battery pass exposed a real
# scoped-VMEM OOM in the outroll form (un-budgeted prologue f32 upcast
# + fix-up temporaries, fixed in conv3d.py) — so every conv A/B number
# is re-taken under the corrected accounting, including the new hband
# form (VERDICT r3 item 2's unattempted zero-copy lever).
# Usage: bench_r4_retry.sh [outdir]
set -u
OUT=${1:-/tmp/bench_r4}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name, env..., cmd...
  local name=$1; shift
  echo "=== $name"
  timeout 900 env "$@" 2>&1 | grep -v "cpu_aot\|E08\|experimental" \
    | tee "$OUT/$name.log" | tail -6
}

for b in 128 16 8; do
  for form in outroll hband x3; do
    run "convs_b${b}_${form}" VALUES_TPU_BANDED_FORM=$form \
        python scripts/bench_convs.py $b --pallas-only
  done
done
run "convs_b8_nofold" VALUES_TPU_FOLD_DEEP=0 \
    python scripts/bench_convs.py 8 --pallas-only
run "convs_b16_nofold" VALUES_TPU_FOLD_DEEP=0 \
    python scripts/bench_convs.py 16 --pallas-only
echo "retry done -> $OUT"
