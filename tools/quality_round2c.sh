#!/bin/bash
# Round-2 quality matrix, third wave: real-photograph data end to end.
# Uses the crop dataset from tools/make_real_dataset.py (292 images in
# image-folder layout, celeba geometry: 128x128 HR, x4 max) to exercise the
# PIL/imagefolder pipeline with real photos — the synthetic-trained models
# are off-distribution here, so each leg finetunes on the real crops first
# (train split = all but the held-out last batch, reference config.py:271).
set -u
cd "$(dirname "$0")/.."

DATA=quality_runs/real_data
[ -d "$DATA/photos" ] || python tools/make_real_dataset.py --out "$DATA"

run() {
  local name=$1; shift
  mkdir -p "quality_runs/$name"
  echo "=== $name: $*"
  timeout 7200 python -m sisr_tpu.cli.train "$@" \
    --write-root "quality_runs/$name" \
    > "quality_runs/$name/train.log" 2>&1
  echo "=== $name rc=$? $(grep -E 'PSNR' "quality_runs/$name/train.log" | tail -1)"
}

# x2 on real photos: transplant the synthetic x2 model, finetune.
# celeba geometry at x2 = 64x64 HR (reference reduce semantics).
run real_x2 --preset x2_mse --checkpoint quality_runs/x2/0 \
  --dataset celeba --data-root "$DATA" --batch-size 16 \
  --num-epochs 120 --lr 1e-4 --seed 60 --fused-steps 8

# x4 on real photos (the BASELINE headline geometry: 32 -> 128):
# continue the grown x4 model on real crops.
run real_x4 --preset x2_mse --progressive-suffix 2 \
  --checkpoint quality_runs/x4_v3/0 \
  --dataset celeba --data-root "$DATA" --batch-size 16 \
  --num-epochs 120 --lr 1e-4 --seed 61 --fused-steps 8

for spec in real_x2:0:2048 real_x4:1:2048; do
  IFS=: read name suf len <<< "$spec"
  [ -f "quality_runs/$name/0" ] && \
    python tools/eval_quality.py --checkpoint "quality_runs/$name/0" \
      --n-suffixes "$suf" --dataset celeba --data-root "$DATA" \
      --label "$name" 2>/dev/null | tee -a quality_runs/eval_r2.jsonl
done

echo "=== quality wave 3 done"
