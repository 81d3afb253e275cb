#!/bin/bash
# Quality wave 8: the 16x data point — completing the PSNR-vs-data curves.
#
# Wave 7 landed the 3rd point of the x4 curve: 2048 -> 26.99 dB (x4_prog),
# 8192 -> 28.51 (x4_v2), 32768 -> 29.52 (x4_v4) — roughly +1 dB per 4x
# data with no sign of saturation (x4_v4 still rising at its final epoch).
# This wave adds a 4th point at synthetic-len 131072 (16x the wave-2
# volume) for x4 and x2, and extends the x8 curve (2048 -> 8192 done in
# wave 6; 32768 here). Same leak-free held-out-last-batch split; the
# --fresh-n eval reads fully-unseen indices past the training range.
#
# SISR_SYNTH_CACHE_GB=30 memoizes the full 131072-image working set
# (~26 GB fp32 on a 125 GB host) so epochs past the first pay no
# regeneration cost. Continuations of already-grown checkpoints use the
# even --progressive-suffix (wrap before load; odd rebuilds a fresh base
# and transplants 0% — see loop._PRE_SUFFIXES and the wave-6 note).
set -u
cd "$(dirname "$0")/.."
export SISR_SYNTH_CACHE_GB=30

run() {
  local name=$1 tmo=$2; shift 2
  mkdir -p "quality_runs/$name"
  echo "=== $name: $*"
  timeout "$tmo" python -m sisr_tpu.cli.train "$@" \
    --write-root "quality_runs/$name" \
    > "quality_runs/$name/train.log" 2>&1
  echo "=== $name rc=$? $(grep -E 'PSNR' "quality_runs/$name/train.log" | tail -1)"
}

run x4_v5 19800 --preset x2_mse --progressive-suffix 2 \
  --checkpoint quality_runs/x4_v4/0 \
  --dataset synthetic --synthetic-len 131072 --batch-size 16 \
  --num-epochs 8 --lr 1e-4 --seed 72 --fused-steps 8

run x8_v3 14400 --preset x2_mse --progressive-suffix 4 \
  --checkpoint quality_runs/x8_v2/0 \
  --dataset synthetic --synthetic-len 32768 --batch-size 16 \
  --num-epochs 8 --lr 1e-4 --seed 73 --fused-steps 8

run x2_v3 14400 --preset x2_mse \
  --checkpoint quality_runs/x2_v2/0 \
  --dataset synthetic --synthetic-len 131072 --batch-size 16 \
  --num-epochs 8 --lr 1e-4 --seed 74 --fused-steps 8

for spec in x4_v5:1:131072 x8_v3:2:32768 x2_v3:0:131072; do
  IFS=: read name suf len <<< "$spec"
  [ -f "quality_runs/$name/0" ] && \
    python tools/eval_quality.py --checkpoint "quality_runs/$name/0" \
      --n-suffixes "$suf" --synthetic-len "$len" --fresh-n 64 \
      --label "$name" 2>/dev/null | tee -a quality_runs/eval_r2.jsonl
done

echo "=== quality wave 8 done"
