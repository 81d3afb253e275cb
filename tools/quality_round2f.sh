#!/bin/bash
# Quality wave 6: x8 data-scaled continuation.
#
# x8_prog (40 epochs, synthetic-len 2048) reproduced the reference's x8
# blur failure mode (reference README.md:74): 23.34 dB vs bicubic 23.70,
# SSIM above. But wave-2 showed that at x4 the SAME len-2048 starvation
# cost 1.5 dB (x4_prog 26.99 vs x4_v2 28.51 at len 8192) — so the x8 gap
# (-0.36 dB) looks data-bound, not capability-bound. This wave continues
# the trained x8 checkpoint on 4x data (len 8192) to test whether the
# TPU build can beat bicubic where the reference documents failure.
#
# Recipe note: the first attempt (60 epochs, lr 2e-4 — log kept at
# quality_runs/x8_v2/train_60ep_lr2e4_aborted.log) peaked at 24.59 dB by
# epoch 4 and then drifted DOWN ~0.07 dB/epoch (23.79 by epoch 20,
# training loss still falling) — the same continuation-overfit pattern as
# wave 4 and x4_v3. 12 epochs at lr 1e-4 lands the checkpoint near the
# peak instead of riding the drift.
#
# --progressive-suffix 4 = wrap two suffixes BEFORE load (already-grown
# x8 checkpoint; see loop._PRE_SUFFIXES — suffix 3 would rebuild a fresh
# x2 base and transplant 0%). Eval at len 8192: its held-out batch
# (last 16 indices) is excluded from training by the reference's
# snapshot-and-skip-last-batch quirk, and --fresh-n adds fully-unseen
# indices; the len-2048 held-out batch is inside this run's training
# split, so the old eval point is NOT reused.
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

run x8_v2 --preset x2_mse --progressive-suffix 4 \
  --checkpoint quality_runs/x8_prog/0 \
  --dataset synthetic --synthetic-len 8192 --batch-size 16 \
  --num-epochs 12 --lr 1e-4 --seed 66 --fused-steps 8

[ -f quality_runs/x8_v2/0 ] && \
  python tools/eval_quality.py --checkpoint quality_runs/x8_v2/0 \
    --n-suffixes 2 --synthetic-len 8192 --fresh-n 64 --label x8_v2 \
    2>/dev/null | tee -a quality_runs/eval_r2.jsonl

echo "=== quality wave 6 done"
