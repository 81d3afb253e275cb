#!/bin/bash
# Supervise tools/round4_chain.sh across relay outages. The chain now
# distinguishes outages (exit 75; retry forever) from real failures
# (attempt-capped, then marked .failed): the supervisor keeps cycling
# until every leg has ACTUALLY run (checkpoint present) or is marked
# permanently failed — round-3's "transient outage permanently cancels
# legs" failure mode (VERDICT r3 weak #4 / next #2) can't recur.
set -u
cd "$(dirname "$0")/.."
LOG=quality_runs/watchdog.log
log() { echo "[super4] $(date -u +%Y-%m-%dT%H:%M:%SZ) $*" | tee -a "$LOG"; }

probe() {
  timeout 280 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu'
assert float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()) == 128.0 ** 3
print('TPU OK')" 2>/dev/null | grep -q "TPU OK"
}

resolved() {  # leg done (a numeric ckpt) or permanently failed
  ls "quality_runs/$1" 2>/dev/null | grep -qE '^[0-9]+$' && return 0
  [ -f "quality_runs/$1.failed" ]
}

done_yet() {
  for leg in x4a x4b x4_ramp_dfeat x2_gan_dfeat_s71 x2_gan_dfeat_s72 \
             real_x4_v2 x8a x4c; do
    resolved "$leg" || return 1
  done
  [ -s quality_runs/perf_r3/fused_stem.jsonl ] || return 1
  grep -q '"label": "real_x2_v2_recal"' quality_runs/eval_r4.jsonl 2>/dev/null
}

rescue_paused() {
  # bench.py SIGSTOPs queue pids and records them in this file; if bench
  # died uncleanly (OOM/SIGKILL) they stay frozen forever. Rescue any
  # pause older than 45 min (an orderly bench resumes well within that).
  local f=/tmp/sisr_bench_paused.pids
  [ -f "$f" ] || return 0
  local age=$(( $(date +%s) - $(stat -c %Y "$f") ))
  [ "$age" -gt 2700 ] || return 0
  log "rescuing orphaned SIGSTOPped pids: $(cat "$f") (pause age ${age}s)"
  for p in $(cat "$f"); do kill -CONT "$p" 2>/dev/null; done
  rm -f "$f"
}

MAX_PASSES=${MAX_PASSES:-60}
pass=0
log "supervisor4 start (max $MAX_PASSES passes)"
while [ "$pass" -lt "$MAX_PASSES" ]; do
  pass=$((pass + 1))
  rescue_paused
  if done_yet; then log "all legs resolved — supervisor done"; exit 0; fi
  if probe; then
    log "pass $pass: chip answers — running chain"
    bash tools/round4_chain.sh
    rc=$?
    log "pass $pass: chain exited rc=$rc"
    if [ $rc -eq 0 ] && done_yet; then
      log "all legs resolved — supervisor done"; exit 0
    fi
    # rc=75: outage mid-chain; rc=0 with legs unresolved: real-failed legs
    # may still be retryable next pass (attempt counter < cap)
  else
    log "pass $pass: TPU unreachable"
  fi
  sleep 180
done
log "supervisor4 gave up after $MAX_PASSES passes"
exit 1
