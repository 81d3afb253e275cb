#!/bin/bash
# Probe the TPU relay; when it answers, relaunch the wave-8 quality script.
# The axon relay dropped mid-run once (wave-8 leg 1, ~19:31 wall); this
# watchdog recovers the run without manual supervision.
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -c "
import jax
import jax.numpy as jnp
assert jax.default_backend() == 'tpu'
y = (jnp.ones((128,128)) @ jnp.ones((128,128))).sum()
assert float(y) == 128.0 * 128.0
print('TPU OK')
" 2>/dev/null | grep -q "TPU OK"
}

echo "[watchdog] $(date -u +%H:%M:%S) start"
while true; do
  if probe; then
    echo "[watchdog] $(date -u +%H:%M:%S) TPU is back — relaunching wave 8"
    rm -rf quality_runs/x4_v5   # leg 1 had no checkpoint yet; restart clean
    nohup bash tools/quality_round2h.sh > /tmp/wave8.log 2>&1 &
    echo $! > /tmp/wave8.pid
    echo "[watchdog] wave8 pid $(cat /tmp/wave8.pid)"
    exit 0
  fi
  echo "[watchdog] $(date -u +%H:%M:%S) TPU still unreachable"
  sleep 180
done
