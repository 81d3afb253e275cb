#!/bin/bash
# Wave-2 remainder with trimmed epoch budgets (the full-length wave ran
# ~2.5 min/epoch end-to-end and would not fit the session):
# - x4_scratch at 40 epochs = the progressive leg's exact finetune budget
#   (same data, same epochs, random init) — a cleaner equal-budget
#   comparison for the reference's progressive-beats-scratch claim.
# - x8_prog at 40 epochs: enough to demonstrate the reference's documented
#   x8 failure mode (blur) and the suffix=3 wiring.
set -u
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  mkdir -p "quality_runs/$name"
  echo "=== $name: $*"
  timeout 10800 python -m sisr_tpu.cli.train "$@" \
    --write-root "quality_runs/$name" \
    > "quality_runs/$name/train.log" 2>&1
  echo "=== $name rc=$? $(grep -E 'PSNR' "quality_runs/$name/train.log" | tail -1)"
}

run x4_scratch --preset x2_mse --progressive-suffix 1 \
  --dataset synthetic --synthetic-len 8192 --batch-size 16 \
  --num-epochs 40 --lr 2e-4 --seed 48 --fused-steps 8

run x8_prog --preset x2_mse --progressive-suffix 3 \
  --checkpoint quality_runs/x4_v3/0 \
  --dataset synthetic --synthetic-len 2048 --batch-size 16 \
  --num-epochs 40 --lr 2e-4 --seed 49 --fused-steps 8

run x4_ramp --preset x4_ramp --ramp-epoch 161 \
  --checkpoint quality_runs/x4_v3/0 \
  --dataset synthetic --synthetic-len 8192 --batch-size 16 \
  --num-epochs 4 --seed 50

run x8_unsup --preset x8 --unsupervised \
  --dataset synthetic --synthetic-len 2048 --batch-size 16 \
  --num-epochs 30 --seed 51

for spec in x4_v3:1:8192 x4_scratch:1:8192 x8_prog:2:2048 x4_ramp:1:8192 x8_unsup:2:2048; do
  IFS=: read name suf len <<< "$spec"
  [ -f "quality_runs/$name/0" ] && \
    python tools/eval_quality.py --checkpoint "quality_runs/$name/0" \
      --n-suffixes "$suf" --synthetic-len "$len" --label "$name" \
      2>/dev/null | tee -a quality_runs/eval_r2.jsonl
done

echo "=== quality wave 2 (rest) done"
