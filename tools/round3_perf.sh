#!/bin/bash
# Round-3 perf measurements (after the recovery + quality waves):
#   1. l0/l1 exact-math layout sweep (VERDICT r2 next #3ii)
#   2. inference roofline: FLOPs / bytes / MFU / speed-of-light (next #4)
# Results tee'd to quality_runs/perf_r3/ (committed) and summarized in
# BENCH_NOTES round 3.
set -u
cd "$(dirname "$0")/.."
LOG=quality_runs/watchdog.log
log() { echo "[perf3] $(date -u +%Y-%m-%dT%H:%M:%SZ) $*" | tee -a "$LOG"; }
mkdir -p quality_runs/perf_r3

log "l0/l1/l3 layout sweep"
timeout 3600 python tools/bench_l01_layouts.py \
  2>quality_runs/perf_r3/l01_layouts.err | tee quality_runs/perf_r3/l01_layouts.jsonl
log "layout sweep rc=$?"

log "fused-stem kernel re-attempt (grid-over-batch MXU + pad16 lanes)"
timeout 3600 python tools/bench_fused_stem.py \
  2>quality_runs/perf_r3/fused_stem.err | tee quality_runs/perf_r3/fused_stem.jsonl
log "fused stem rc=$?"

log "infer roofline"
timeout 3600 python tools/infer_roofline.py \
  2>quality_runs/perf_r3/infer_roofline.err | tee quality_runs/perf_r3/infer_roofline.jsonl
log "infer roofline rc=$?"

log "perf wave done"
