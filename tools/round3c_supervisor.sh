#!/bin/bash
# Supervise tools/round3c_chain.sh across relay outages (same policy as
# round3b_supervisor.sh; done-condition updated for the pass-C legs).
set -u
cd "$(dirname "$0")/.."
LOG=quality_runs/watchdog.log
log() { echo "[super3c] $(date -u +%Y-%m-%dT%H:%M:%SZ) $*" | tee -a "$LOG"; }

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu'
assert float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()) == 128.0 ** 3
print('TPU OK')" 2>/dev/null | grep -q "TPU OK"
}

has_ckpt() { ls "quality_runs/$1" 2>/dev/null | grep -qE '^[0-9]+$'; }

done_yet() {
  has_ckpt x4b && has_ckpt x4_ramp_dfeat && has_ckpt real_x4_v2 &&
  has_ckpt x8a && has_ckpt x4c &&
  [ -s quality_runs/perf_r3/infer_roofline.jsonl ]
}

MAX_PASSES=${MAX_PASSES:-30}
pass=0
log "supervisor start (max $MAX_PASSES passes)"
while [ "$pass" -lt "$MAX_PASSES" ]; do
  pass=$((pass + 1))
  if probe; then
    log "pass $pass: chip answers — running chain"
    bash tools/round3c_chain.sh
    log "pass $pass: chain exited rc=$?"
    if done_yet; then log "all key outputs present — supervisor done"; exit 0; fi
  else
    log "pass $pass: TPU unreachable"
  fi
  sleep 180
done
log "supervisor gave up after $MAX_PASSES passes"
exit 1
