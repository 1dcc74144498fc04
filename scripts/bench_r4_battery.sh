#!/bin/bash
# Round-4 measurement battery: the un-run round-3 battery PLUS the
# round-4 landings (fused trainable norm A/B, Pallas sampling-tail A/B,
# SSN scorer line). Run on the real chip; outputs under /tmp/bench_r4/.
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

# 1. banded-kernel forms, whole ensemble-5 forward
for b in 128 16 8; do
  run "convs_b${b}_outroll" VALUES_TPU_BANDED_FORM=outroll \
      python scripts/bench_convs.py $b --pallas-only
  run "convs_b${b}_x3" VALUES_TPU_BANDED_FORM=x3 \
      python scripts/bench_convs.py $b --pallas-only
done
run "convs_b128_xla" python scripts/bench_convs.py 128 --xla-only

# 2. deep-level lane refill A/B (batch 8: L4/L5 fold vs XLA fallback)
run "convs_b8_nofold" VALUES_TPU_FOLD_DEEP=0 \
    python scripts/bench_convs.py 8 --pallas-only
run "convs_b16_nofold" VALUES_TPU_FOLD_DEEP=0 \
    python scripts/bench_convs.py 16 --pallas-only

# 3. training step: fused trainable norm A/B (r4) x fold A/B (r3)
run "train_step" python scripts/bench_train_step.py
run "train_step_nofusednorm" VALUES_TPU_TRAIN_FUSED_NORM=0 \
    python scripts/bench_train_step.py
run "train_step_nofold" VALUES_TPU_FOLD_DEEP=0 \
    python scripts/bench_train_step.py

# 4. sampling tails: aleatoric XLA vs Pallas sampler + SSN scorer (r4)
run "sampling_b32" python scripts/bench_sampling.py 32
run "sampling_b8" python scripts/bench_sampling.py 8

# 5. headline bench
run "bench" python bench.py

# 6. 2D full-res
run "2d_fullres" python scripts/bench_2d_fullres.py
echo "battery done -> $OUT"
