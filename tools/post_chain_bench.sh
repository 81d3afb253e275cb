#!/bin/bash
# After the round-4 quality chain resolves, capture the round's perf
# evidence on an otherwise-idle chip:
#   1. tools/bench_trunk_v2.py — the serving design-point table
#      (VERDICT r3 next #6) -> quality_runs/perf_r4/trunk_v2.jsonl
#   2. python bench.py — a fresh green bench artifact AND the warm
#      .jax_cache entry for the driver's own end-of-round `python bench.py`
#      (the quality legs never compile bench's exact GAN fused-step, so
#      only bench itself can seed that cache key; VERDICT r3 next #3).
#
# Usage: nohup bash tools/post_chain_bench.sh <supervisor_pid> &
set -u
cd "$(dirname "$0")/.."
LOG=quality_runs/watchdog.log
log() { echo "[postbench] $(date -u +%Y-%m-%dT%H:%M:%SZ) $*" | tee -a "$LOG"; }

SUP_PID=${1:-}
if [ -n "$SUP_PID" ]; then
  log "waiting for supervisor pid $SUP_PID"
  while kill -0 "$SUP_PID" 2>/dev/null; do sleep 120; done
fi
log "supervisor gone — starting perf captures"

probe() {
  timeout 280 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu'
assert float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()) == 128.0 ** 3
print('TPU OK')" 2>/dev/null | grep -q "TPU OK"
}

until probe; do log "chip unreachable — retry in 180s"; sleep 180; done

export JAX_COMPILATION_CACHE_DIR=$PWD/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
mkdir -p quality_runs/perf_r4

if [ ! -s quality_runs/perf_r4/trunk_v2.jsonl ]; then
  log "bench_trunk_v2 start"
  timeout 5400 python tools/bench_trunk_v2.py \
    2>quality_runs/perf_r4/trunk_v2.err | tee quality_runs/perf_r4/trunk_v2.jsonl
  log "bench_trunk_v2 rc=$?"
fi

log "bench.py start (cache-seeding green capture)"
SISR_BENCH_BUDGET_S=5400 SISR_BENCH_PREFLIGHT_S=900 timeout 7200 \
  python bench.py > quality_runs/bench_green_r4.json \
  2>quality_runs/bench_green_r4.err
log "bench.py rc=$? $(cat quality_runs/bench_green_r4.json)"

for i in 1 2 3; do
  git add quality_runs/perf_r4/trunk_v2.jsonl quality_runs/bench_green_r4.json \
    2>/dev/null
  if git diff --cached --quiet 2>/dev/null; then break; fi
  git commit -q -m "Round-4 perf captures: trunk-v2 design points + green bench" \
    && { log "perf captures committed"; break; }
  sleep 10
done
log "post-chain perf done"
