#!/bin/bash
# Supervise tools/round5c_chain.sh across relay outages (round5b_supervisor
# contract: chain exits 75 on outage, supervisor retries until every
# target resolves or attempts are exhausted). Bench-pause rescue lives in
# the standalone tools/pause_rescuer.sh, never here.
set -u
cd "$(dirname "$0")/.."
LOG=quality_runs/watchdog.log
log() { echo "[super5c] $(date -u +%Y-%m-%dT%H:%M:%SZ) $*" | tee -a "$LOG"; }

row() { grep -q "\"label\": \"$1\"" quality_runs/eval_r5.jsonl 2>/dev/null; }
resolved() { row "$1" || [ -f "quality_runs/$1.failed" ]; }

done_yet() {
  resolved x4_ramp_scaled || return 1
  resolved x4e || return 1
  return 0
}

MAX_PASSES=${MAX_PASSES:-40}
pass=0
log "supervisor5c start (max $MAX_PASSES passes)"
while [ "$pass" -lt "$MAX_PASSES" ]; do
  pass=$((pass + 1))
  if done_yet; then log "all round-5c targets resolved — done"; exit 0; fi
  log "pass $pass: running chain"
  bash tools/round5c_chain.sh
  rc=$?
  log "pass $pass: chain exited rc=$rc"
  if [ $rc -eq 0 ] && done_yet; then
    log "all round-5c targets resolved — done"; exit 0
  fi
  sleep 60
done
log "supervisor5c gave up after $MAX_PASSES passes"
exit 1
