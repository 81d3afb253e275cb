#!/bin/bash
# Follow-up to tools/mnist_dfeat_r4.sh: the two dfeat legs there failed
# because the default dfeat_taps (1,3,5) are out of range for the small
# mnist discriminator ladder (--d-features 64,64,128,128 => 3 blocks,
# valid taps 0..2; see train/step.py make_train_step's range check).
# Re-run them with --dfeat-taps 1,2 (the post-stride-2 blocks, mirroring
# the full ladder's choice of BN-normalized mid-ladder activations).
#
# Waits for the original script (pid file /tmp/mnist4.pid) so the two
# CPU queues never overlap on this 1-core host.
set -u
cd "$(dirname "$0")/.."
LOG=quality_runs/watchdog.log
EVAL=quality_runs/eval_r4_cpu.jsonl
log() { echo "[mnist4b] $(date -u +%Y-%m-%dT%H:%M:%SZ) $*" | tee -a "$LOG"; }

if [ -f /tmp/mnist4.pid ]; then
  P=$(cat /tmp/mnist4.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
log "original mnist queue done — running dfeat re-legs"

tr4() {  # tr4 <name> <args...>
  local name=$1; shift
  [ -f "quality_runs/$name/0" ] && { log "$name: done, skip"; return 0; }
  mkdir -p "quality_runs/$name"
  log "run $name"
  timeout 14400 python -m sisr_tpu.cli.train --cpu --dataset mnist \
    --d-features 64,64,128,128 --d-strides 1,2,1,2 \
    --synthetic-len 4096 --batch-size 16 --no-plot-first \
    --write-root "quality_runs/$name" "$@" \
    >> "quality_runs/$name/train.log" 2>&1
  log "$name rc=$? $(grep -E 'PSNR' "quality_runs/$name/train.log" | tail -1)"
}

ev4() {  # ev4 <name>
  local name=$1
  grep -q "\"label\": \"$name\"" "$EVAL" 2>/dev/null && return 0
  [ -f "quality_runs/$name/0" ] || return 0
  timeout 3600 python tools/eval_quality.py --cpu \
    --checkpoint "quality_runs/$name/0" --n-suffixes 0 --dataset mnist \
    --synthetic-len 4096 --fresh-n 16 --label "$name" 2>/dev/null \
    | tee -a "$EVAL"
}

B=quality_runs/mnist_base_r4/0
[ -f "$B" ] || { log "mnist base missing — abort"; exit 1; }

tr4 mnist_dfeat_s0p2_r4 --preset x2_gan --checkpoint "$B" --num-epochs 4 \
  --seed 81 --content-extractor dfeat --dfeat-taps 1,2 --dfeat-scale 0.2
ev4 mnist_dfeat_s0p2_r4
tr4 mnist_dfeat_s1p0_r4 --preset x2_gan --checkpoint "$B" --num-epochs 4 \
  --seed 81 --content-extractor dfeat --dfeat-taps 1,2 --dfeat-scale 1.0
ev4 mnist_dfeat_s1p0_r4
ev4 mnist_gan4_r4

for i in 1 2 3; do
  git add "$EVAL" quality_runs/mnist_*_r4/train.log 2>/dev/null
  if git diff --cached --quiet 2>/dev/null; then break; fi
  git commit -q -m "mnist-geometry dfeat rows (valid taps for the 3-block ladder)" \
    && { log "mnist4b rows committed"; break; }
  sleep 10
done
log "mnist dfeat r4b done"
