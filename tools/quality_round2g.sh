#!/bin/bash
# Quality wave 7: data-scaling legs at x4 and x2.
#
# The matrix so far samples synthetic-len 2048 (x4_prog 26.99 dB) and
# 8192 (x4_v2/v3 28.4-28.5 dB) at x4. This wave continues the best x4
# and x2 checkpoints on 32768 images — 4x more — completing a 3-point
# PSNR-vs-data curve per scale and (if the 2048->8192 trend holds at
# ~+0.3-0.5 dB per 4x) raising the headline rows. Same leak-free
# held-out-last-batch split; --fresh-n evals fully-unseen indices.
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

run x4_v4 --preset x2_mse --progressive-suffix 2 \
  --checkpoint quality_runs/x4_v3/0 \
  --dataset synthetic --synthetic-len 32768 --batch-size 16 \
  --num-epochs 15 --lr 1e-4 --seed 70 --fused-steps 8

run x2_v2 --preset x2_mse \
  --checkpoint quality_runs/x2/0 \
  --dataset synthetic --synthetic-len 32768 --batch-size 16 \
  --num-epochs 15 --lr 1e-4 --seed 71 --fused-steps 8

for spec in x4_v4:1:32768 x2_v2:0:32768; do
  IFS=: read name suf len <<< "$spec"
  [ -f "quality_runs/$name/0" ] && \
    python tools/eval_quality.py --checkpoint "quality_runs/$name/0" \
      --n-suffixes "$suf" --synthetic-len "$len" --fresh-n 64 \
      --label "$name" 2>/dev/null | tee -a quality_runs/eval_r2.jsonl
done

echo "=== quality wave 7 done"
