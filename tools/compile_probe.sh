#!/bin/bash
# Probe when the relay's server-side compile queue unblocks (round 5:
# two orphaned trunk_v2_t8 Mosaic compiles from killed clients kept the
# queue busy for hours; cached executions kept working throughout).
# Every 300 s, submit one tiny UNIQUE compile (cache-proof) with a 240 s
# timeout and log the outcome. Stop by deleting /tmp/compile_probe.run.
LOG=${1:-/tmp/compile_probe.log}
touch /tmp/compile_probe.run
while [ -f /tmp/compile_probe.run ]; do
  N=$(date +%s)
  OUT=$(timeout 240 python - <<EOF 2>/dev/null
import time, jax, jax.numpy as jnp
t0 = time.time()
f = jax.jit(lambda a: a * ${N}.0 + ${N})  # unique constant -> fresh compile
x = jnp.ones((8, 128), jnp.float32)
y = f(x); _ = float(y.sum())
print("compile+run %.1f s" % (time.time() - t0))
EOF
)
  rc=$?
  echo "$(date -u +%H:%M:%S) rc=$rc $OUT" >> "$LOG"
  [ $rc -eq 0 ] && echo "$(date -u +%H:%M:%S) QUEUE UNBLOCKED" >> "$LOG"
  sleep 300
done
