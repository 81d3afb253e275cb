#!/bin/bash
# Everything round 3 needs from the chip, in priority order, resumable —
# armed behind tools/tpu_watchdog.sh:
#   1. round3_recovery.sh — green bench capture + the lost wave-8 legs
#   2. quality_round3.sh  — dfeat calibration/reruns + grown real corpus
#   3. round3_perf.sh     — l0/l1 layout sweep + infer roofline
set -u
cd "$(dirname "$0")/.."

# persistent compilation cache across the chain's many short-lived python
# processes (each full GAN-step compile is ~5 min on the TPU). Canary-boot
# jax with the cache configured first; arm it for the chain only if jax
# still works (cache errors normally degrade to plain compiles, but the
# axon relay is experimental — don't bet the round on it untested).
CACHE=$PWD/.jax_cache
if timeout 300 python -c "
import os
os.environ['JAX_COMPILATION_CACHE_DIR'] = '$CACHE'
import jax, jax.numpy as jnp
y = jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128)))
assert float(y) == 128.0 ** 3
print('cache-canary-ok')
" 2>/dev/null | grep -q cache-canary-ok; then
  export JAX_COMPILATION_CACHE_DIR=$CACHE
  export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
  echo "[chain] compilation cache armed at $CACHE"
else
  echo "[chain] compilation cache canary failed — running without"
fi

bash tools/round3_recovery.sh
bash tools/quality_round3.sh
bash tools/round3_perf.sh
