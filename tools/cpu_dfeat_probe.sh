#!/bin/bash
# CPU-backend dfeat_scale probe (directional signal while the TPU relay is
# down; the authoritative calibration is quality_round3.sh on-chip).
#
# Short adversarial finetunes of the trained x2 checkpoint with the dfeat
# content loss at 3 scales, on the CPU backend (--cpu), capped at
# --n-batch 32 so each run is ~10 min on the 1-core host. Evaluates each
# against bicubic on the held-out + fresh synthetic splits.
# Run SERIALLY (1-core host).
set -u
cd "$(dirname "$0")/.."
LOG=quality_runs/watchdog.log
log() { echo "[cpu-dfeat] $(date -u +%Y-%m-%dT%H:%M:%SZ) $*" | tee -a "$LOG"; }

for s in 10 100 1000; do
  name="cpu_dfeat_s$s"
  mkdir -p "quality_runs/$name"
  log "run $name"
  timeout 5400 python -m sisr_tpu.cli.train --cpu --preset x2_gan \
    --checkpoint quality_runs/x2/0 \
    --dataset synthetic --synthetic-len 2048 --batch-size 16 --n-batch 32 \
    --num-epochs 2 --seed 44 --content-extractor dfeat --dfeat-scale "$s" \
    --no-plot-first --write-root "quality_runs/$name" \
    > "quality_runs/$name/train.log" 2>&1
  log "$name rc=$? $(grep -E 'PSNR' "quality_runs/$name/train.log" | tail -1)"
  [ -f "quality_runs/$name/0" ] && \
    timeout 2400 python tools/eval_quality.py --cpu \
      --checkpoint "quality_runs/$name/0" --n-suffixes 0 \
      --synthetic-len 2048 --fresh-n 16 --label "$name" 2>/dev/null \
      | tee -a quality_runs/eval_r3_cpu.jsonl
done
log "cpu dfeat probe done"
