#!/bin/bash
# Round-2 quality matrix, second wave: the remaining canonical workloads.
# Runs sequentially on the single TPU chip; each writes its own train.log.
# Prereqs: quality_runs/x2/0 (80-epoch x2 MSE) and quality_runs/x4_v2/0
# (x2 -> x4 progressive MSE, epoch 120) from the first wave.
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

# 1. x4 continuation: x4_v2 plateaued at ~28.6 dB once its LR decayed; a
#    second leg at lower base LR (the reference's finetune recipe: each run
#    restarts the 10x decay, config.py:170-180) squeezes the plateau.
#    suffix=2 = "load x4": wrap the suffix BEFORE load so the architecture
#    matches the already-grown checkpoint (reference config.py:83-88).
run x4_v3 --preset x2_mse --progressive-suffix 2 \
  --checkpoint quality_runs/x4_v2/0 \
  --dataset synthetic --synthetic-len 8192 --batch-size 16 \
  --num-epochs 40 --lr 5e-5 --seed 52 --fused-steps 8

# 2. x4 from-scratch MSE at x4_v2's data size, ~equal total wall-clock to
#    the x2-pretrain + x4-finetune pair: the comparison row for the
#    reference's progressive-beats-scratch claim (reference README.md:67-71).
run x4_scratch --preset x2_mse --progressive-suffix 1 \
  --dataset synthetic --synthetic-len 8192 --batch-size 16 \
  --num-epochs 60 --lr 2e-4 --seed 48 --fused-steps 8

# 3. x8 progressive: x4 checkpoint + one more suffix (reference
#    progressive_gan_suffix=3 wiring), MSE finetune at LR16 -> HR128.
run x8_prog --preset x2_mse --progressive-suffix 3 \
  --checkpoint quality_runs/x4_v3/0 \
  --dataset synthetic --synthetic-len 2048 --batch-size 16 \
  --num-epochs 80 --lr 2e-4 --seed 49 --fused-steps 8

# 4. x4 adversarial ramp (canonical config 3): resume the x4 model at
#    epoch 160, 1 identity epoch then adversarial+content from epoch 161
#    (num-epochs counts THIS run's epochs; windows are absolute epochs).
run x4_ramp --preset x4_ramp --ramp-epoch 161 \
  --checkpoint quality_runs/x4_v3/0 \
  --dataset synthetic --synthetic-len 8192 --batch-size 16 \
  --num-epochs 4 --seed 50

# 5. x8 unsupervised (no-HR / AmbientGAN, canonical config 5): from scratch,
#    disjoint dataset halves, content loss on LR.
run x8_unsup --preset x8 --unsupervised \
  --dataset synthetic --synthetic-len 2048 --batch-size 16 \
  --num-epochs 30 --seed 51

# Evaluate every wave-2 checkpoint vs bicubic (appends JSONL).
for spec in x4_v3:1:8192 x4_scratch:1:8192 x8_prog:2:2048 x4_ramp:1:8192 x8_unsup:2:2048; do
  IFS=: read name suf len <<< "$spec"
  [ -f "quality_runs/$name/0" ] && \
    python tools/eval_quality.py --checkpoint "quality_runs/$name/0" \
      --n-suffixes "$suf" --synthetic-len "$len" --label "$name" \
      2>/dev/null | tee -a quality_runs/eval_r2.jsonl
done

echo "=== quality wave 2 done"
