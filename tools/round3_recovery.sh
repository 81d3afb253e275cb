#!/bin/bash
# Round-3 priority work the moment the TPU relay answers (armed via
# tools/tpu_watchdog.sh). Order matters:
#   1. bench.py -> a green perf capture (VERDICT r2 "next round" #1)
#   2. the three lost wave-8 data-scaling legs (x4_v5 / x8_v3 / x2_v3)
#
# Each wave-8 leg runs as 2-epoch sub-runs with resume (checkpoints only
# save at run end — reference semantics — so a mid-run relay outage would
# otherwise lose everything). Continuation of a grown x4/x8 checkpoint
# uses the EVEN --progressive-suffix (wrap before load; see CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
export SISR_SYNTH_CACHE_GB=30
LOG=quality_runs/watchdog.log
log() { echo "[recovery] $(date -u +%Y-%m-%dT%H:%M:%SZ) $*" | tee -a "$LOG"; }

log "relay is back — capturing bench"
timeout 2400 python bench.py 2>/tmp/bench_r3.err | tee quality_runs/bench_green_r3.json
log "bench rc=$? $(tail -c 200 quality_runs/bench_green_r3.json)"

latest() { ls -v "quality_runs/$1"/[0-9]* 2>/dev/null | tail -1; }

leg() {
  local name=$1 suffix=$2 len=$3 seed=$4 init_ckpt=$5 total=$6
  mkdir -p "quality_runs/$name"
  while true; do
    local ckpt epochs_done
    ckpt=$(latest "$name")
    epochs_done=$(ls "quality_runs/$name"/[0-9]* 2>/dev/null | wc -l)
    epochs_done=$((epochs_done * 2))
    [ "$epochs_done" -ge "$total" ] && break
    [ -z "$ckpt" ] && ckpt=$init_ckpt
    log "$name: sub-run from $ckpt ($epochs_done/$total epochs done)"
    timeout 7200 python -m sisr_tpu.cli.train --preset x2_mse \
      --progressive-suffix "$suffix" --checkpoint "$ckpt" \
      --dataset synthetic --synthetic-len "$len" --batch-size 16 \
      --num-epochs 2 --lr 1e-4 --seed "$seed" --fused-steps 8 \
      --write-root "quality_runs/$name" \
      >> "quality_runs/$name/train.log" 2>&1
    log "$name sub-run rc=$? $(grep -E 'PSNR' "quality_runs/$name/train.log" | tail -1)"
    # no new checkpoint -> the sub-run died (relay outage / OOM): stop this
    # leg rather than loop forever
    [ "$(latest "$name")" = "$ckpt" ] && { log "$name: no progress, aborting leg"; break; }
  done
}

leg x4_v5 2 131072 72 quality_runs/x4_v4/0 8
leg x8_v3 4 32768  73 quality_runs/x8_v2/0 8
leg x2_v3 0 131072 74 quality_runs/x2_v2/0 8

for spec in x4_v5:1:131072 x8_v3:2:32768 x2_v3:0:131072; do
  IFS=: read name suf len <<< "$spec"
  ck=$(latest "$name")
  [ -n "$ck" ] && \
    python tools/eval_quality.py --checkpoint "$ck" \
      --n-suffixes "$suf" --synthetic-len "$len" --fresh-n 64 \
      --label "$name" 2>/dev/null | tee -a quality_runs/eval_r2_fixed.jsonl
done
log "wave-8 legs + eval done"
