#!/bin/bash
# Rebuild the mnist-geometry dfeat evidence on the CPU backend
# (VERDICT r3 next #7: "include the mnist-geometry dfeat row" — the
# round-3 runs' checkpoints were wiped by the inter-round VM reset, only
# train.logs survive). Mirrors the round-3 recipes (seeds 80/81, 8 MSE
# epochs then 4 adversarial): base -> dfeat at scales 0.2 / 1.0 -> a
# no-dfeat control -> eval rows appended to eval_r4_cpu.jsonl + committed.
#
# Runs under `nice -n 19` from the caller: the on-chip chain's host-side
# work (data gen, probes) must win this 1-core host.
set -u
cd "$(dirname "$0")/.."
LOG=quality_runs/watchdog.log
EVAL=quality_runs/eval_r4_cpu.jsonl
log() { echo "[mnist4] $(date -u +%Y-%m-%dT%H:%M:%SZ) $*" | tee -a "$LOG"; }

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

tr4 mnist_base_r4 --preset x2_mse --num-epochs 8 --lr 2e-4 --seed 80
B=quality_runs/mnist_base_r4/0
[ -f "$B" ] || { log "mnist base missing — abort"; exit 1; }
ev4 mnist_base_r4

tr4 mnist_dfeat_s0p2_r4 --preset x2_gan --checkpoint "$B" --num-epochs 4 \
  --seed 81 --content-extractor dfeat --dfeat-scale 0.2
ev4 mnist_dfeat_s0p2_r4
tr4 mnist_dfeat_s1p0_r4 --preset x2_gan --checkpoint "$B" --num-epochs 4 \
  --seed 81 --content-extractor dfeat --dfeat-scale 1.0
ev4 mnist_dfeat_s1p0_r4
tr4 mnist_gan4_r4 --preset x2_gan --checkpoint "$B" --num-epochs 4 --seed 81
ev4 mnist_gan4_r4

for i in 1 2 3; do
  git add "$EVAL" quality_runs/mnist_*_r4/train.log 2>/dev/null
  if git diff --cached --quiet 2>/dev/null; then break; fi
  git commit -q -m "mnist-geometry dfeat rows (CPU backend, round-4 rebuild)" \
    && { log "mnist rows committed"; break; }
  sleep 10
done
log "mnist dfeat r4 done"
