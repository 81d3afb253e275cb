#!/bin/bash
# Quality wave 5: real-photo finetunes with 8x dihedral augmentation
# (--augment-dihedral). Waves 3-4 showed the 276-image crop set binds:
# real_x4 reached bicubic parity, real_x2 -0.29 dB, and longer low-LR
# training overfit instead of helping. Augmentation multiplies effective
# data 8x with the SAME untouched held-out batch (leak-free layout), so
# these evals are directly comparable to the wave-3 rows.
set -u
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  mkdir -p "quality_runs/$name"
  echo "=== $name: $*"
  timeout 7200 python -m sisr_tpu.cli.train "$@" \
    --write-root "quality_runs/$name" \
    > "quality_runs/$name/train.log" 2>&1
  echo "=== $name rc=$? $(grep -E 'PSNR' "quality_runs/$name/train.log" | tail -1)"
}

DATA=quality_runs/real_data

run real_x2_aug --preset x2_mse --checkpoint quality_runs/x2/0 \
  --dataset celeba --data-root "$DATA" --batch-size 16 \
  --num-epochs 60 --lr 1e-4 --seed 64 --fused-steps 8 --augment-dihedral

run real_x4_aug --preset x2_mse --progressive-suffix 2 \
  --checkpoint quality_runs/x4_v3/0 \
  --dataset celeba --data-root "$DATA" --batch-size 16 \
  --num-epochs 60 --lr 1e-4 --seed 65 --fused-steps 8 --augment-dihedral

for spec in real_x2_aug:0 real_x4_aug:1; do
  IFS=: read name suf <<< "$spec"
  [ -f "quality_runs/$name/0" ] && \
    python tools/eval_quality.py --checkpoint "quality_runs/$name/0" \
      --n-suffixes "$suf" --dataset celeba --data-root "$DATA" \
      --label "$name" 2>/dev/null | tee -a quality_runs/eval_r2.jsonl
done

echo "=== quality wave 5 done"
