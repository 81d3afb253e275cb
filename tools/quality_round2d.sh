#!/bin/bash
# Quality wave 4: extend the real-photo finetunes. Wave 3 ended with
# real_x4 at bicubic parity (deploy 23.06 vs 23.08 dB, SSIM above) and
# real_x2 at -0.29 dB; both were only 120 epochs (~2k steps) on the
# 276-image crop set. Continue each at half LR for 300 epochs, then
# re-evaluate (eval picks checkpoint file "1", the resumed save).
set -u
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  echo "=== $name: $*"
  timeout 7200 python -m sisr_tpu.cli.train "$@" \
    --write-root "quality_runs/$name" \
    >> "quality_runs/$name/train.log" 2>&1
  echo "=== $name rc=$? $(grep -E 'PSNR' "quality_runs/$name/train.log" | tail -1)"
}

DATA=quality_runs/real_data

run real_x2 --preset x2_mse --checkpoint quality_runs/real_x2/0 \
  --dataset celeba --data-root "$DATA" --batch-size 16 \
  --num-epochs 300 --lr 5e-5 --seed 62 --fused-steps 8

run real_x4 --preset x2_mse --progressive-suffix 2 \
  --checkpoint quality_runs/real_x4/0 \
  --dataset celeba --data-root "$DATA" --batch-size 16 \
  --num-epochs 300 --lr 5e-5 --seed 63 --fused-steps 8

for spec in real_x2:0 real_x4:1; do
  IFS=: read name suf <<< "$spec"
  [ -f "quality_runs/$name/1" ] && \
    python tools/eval_quality.py --checkpoint "quality_runs/$name/1" \
      --n-suffixes "$suf" --dataset celeba --data-root "$DATA" \
      --label "${name}_ext" 2>/dev/null | tee -a quality_runs/eval_r2.jsonl
done

echo "=== quality wave 4 done"
