#!/bin/bash
# Round-5c final-hour queue (post-VM-reset continuation of round5b).
# The reset killed the 5b queue after leg 1: keep/x4_best.ckpt (the slimmed
# x4d result, 29.37/29.54 dB deploy vs bicubic 27.77/27.63) and the x4d
# eval rows are committed; the run-dir full checkpoints are gone. Re-scoped
# to fit a ~1h window:
#   1. x4_ramp_scaled: the flagship adversarial ramp (preset x4_ramp +
#      dfeat, reference config.py:124-166 + README.md:55) on the best MSE
#      base — 16384-img corpus DEVICE-RESIDENT (3.2 GB fits HBM next to
#      the 1.6 GB replay ring; the GAN step takes `data` as an explicit
#      jit argument, train/step.py) so the ramp runs at step speed instead
#      of round-4's 1.27 s/step relay-streaming rate. 2 epochs = 2048 GAN
#      steps, the same step count as round-4's x4_ramp_dfeat.
#   2. perceptual eval rows vs the fixed keep/x4_gan.ckpt judge, same
#      corpus/fresh settings as the committed x4d rows.
#   3. x4e: the low-lr (5e-5) continuation the reset killed (24 epochs was
#      366 s of train loop on x4d; cheap once compiled), eval + keep.
#   4. refreshed green bench artifact.
# Failure semantics identical to round5b_chain.sh: rc 75, or rc 124 with a
# dead chip probe or a bench pause overlapping the leg => OUTAGE (retry,
# no attempt consumed); other nonzero => real failure, 2 attempts max.
set -u
cd "$(dirname "$0")/.."
export SISR_SYNTH_CACHE_GB=30
LOG=quality_runs/watchdog.log
EVAL=quality_runs/eval_r5.jsonl
MAX_REAL_ATTEMPTS=${MAX_REAL_ATTEMPTS:-2}
log() { echo "[chain5c] $(date -u +%Y-%m-%dT%H:%M:%SZ) $*" | tee -a "$LOG"; }

if ! swapon --show 2>/dev/null | grep -q /swapfile; then
  if [ ! -f /swapfile ]; then
    fallocate -l 48G /swapfile && chmod 600 /swapfile && mkswap /swapfile
  fi
  swapon /swapfile 2>/dev/null && log "swap armed (48G)" \
    || log "WARN: could not arm swap"
fi

CACHE=$PWD/.jax_cache
if timeout 480 python -c "
import os
os.environ['JAX_COMPILATION_CACHE_DIR'] = '$CACHE'
import jax, jax.numpy as jnp
y = jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128)))
assert float(y) == 128.0 ** 3
print('cache-canary-ok')
" 2>/dev/null | grep -q cache-canary-ok; then
  export JAX_COMPILATION_CACHE_DIR=$CACHE
  export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
  log "compilation cache armed at $CACHE"
else
  log "compilation cache canary failed — running without"
fi

probe() {
  timeout 280 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu'
assert float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()) == 128.0 ** 3
print('TPU OK')" 2>/dev/null | grep -q "TPU OK"
}

latest() {
  ls -v "quality_runs/$1" 2>/dev/null | grep -E '^[0-9]+$' | tail -1 \
    | sed "s|^|quality_runs/$1/|"
}

leg_running() {
  local p
  for p in /proc/[0-9]*/cmdline; do
    [ "$p" = "/proc/$$/cmdline" ] && continue
    tr '\0' ' ' < "$p" 2>/dev/null | grep -qF -- "$1" && return 0
  done
  return 1
}

wait_leg() {
  while leg_running "$1"; do
    log "$2: already in flight — waiting"; sleep 120
  done
}

commit_leg() {
  local msg=$1; shift
  for i in 1 2 3; do
    git add "$@" 2>/dev/null
    if git diff --cached --quiet 2>/dev/null; then return 0; fi
    git commit -q -m "$msg" 2>/dev/null && { log "committed: $msg"; return 0; }
    sleep 10
  done
  log "WARN commit failed: $msg"
}

keep() {
  [ -n "${2:-}" ] && [ -f "$2" ] && python tools/slim_ckpt.py "$2" \
    "quality_runs/keep/$1.ckpt" 2>&1 | tail -1 \
    | while read -r l; do log "keep: $l"; done
}

paused_during() {
  [ -f /tmp/sisr_bench_paused.pids ] && return 0
  [ -f /tmp/sisr_bench_last_pause ] || return 1
  local t
  t=$(cat /tmp/sisr_bench_last_pause 2>/dev/null || echo 0)
  [ "${t:-0}" -ge "$1" ]
}

run() {
  local name=$1 tmo=$2; shift 2
  wait_leg "--write-root quality_runs/$name " "$name"
  if [ -n "$(latest "$name")" ]; then log "$name: done already, skip"; return 0; fi
  if [ -f "quality_runs/$name.failed" ]; then
    log "$name: permanently failed earlier, skip"; return 1; fi
  mkdir -p "quality_runs/$name"
  local t0; t0=$(date +%s)
  log "run $name: $*"
  timeout "$tmo" python -m sisr_tpu.cli.train "$@" \
    --write-root "quality_runs/$name" \
    >> "quality_runs/$name/train.log" 2>&1
  local rc=$?
  log "$name rc=$rc $(grep -E 'PSNR' "quality_runs/$name/train.log" | tail -1)"
  [ $rc -eq 0 ] && return 0
  if [ $rc -eq 75 ]; then log "$name: OUTAGE (pre-flight)"; return 75; fi
  if [ $rc -eq 124 ] && paused_during "$t0"; then
    log "$name: OUTAGE (timed out under a bench pause)"; return 75; fi
  if [ $rc -eq 124 ] && ! probe; then
    log "$name: OUTAGE (timed out; chip probe dead)"; return 75; fi
  local att=0
  [ -f "quality_runs/$name.attempts" ] && att=$(cat "quality_runs/$name.attempts")
  att=$((att + 1)); echo "$att" > "quality_runs/$name.attempts"
  if [ "$att" -ge "$MAX_REAL_ATTEMPTS" ]; then
    touch "quality_runs/$name.failed"
    log "$name: REAL failure (attempt $att/$MAX_REAL_ATTEMPTS) — marked failed"
    return 1
  fi
  log "$name: REAL failure (attempt $att/$MAX_REAL_ATTEMPTS) — will retry next pass"
  return 75
}

ev5() {
  local label=$1 ck=$2 suf=$3; shift 3
  wait_leg "--label $label " "eval:$label"
  grep -q "\"label\": \"$label\"" "$EVAL" 2>/dev/null && return 0
  [ -n "$ck" ] && [ -e "$ck" ] || { log "ev5 $label: no ckpt '$ck'"; return 0; }
  local t0; t0=$(date +%s)
  timeout 3600 python tools/eval_quality.py --checkpoint "$ck" \
    --n-suffixes "$suf" --label "$label" "$@" 2>/dev/null \
    | tee -a "$EVAL"
  local rc=${PIPESTATUS[0]}
  if [ $rc -eq 124 ] && paused_during "$t0"; then
    log "ev5 $label: OUTAGE (bench pause)"; return 75; fi
  if [ $rc -eq 124 ] && ! probe; then return 75; fi
  grep -q "\"label\": \"$label\"" "$EVAL" 2>/dev/null \
    && commit_leg "chain r5c: eval rows for $label" "$EVAL"
}

R() { [ "$1" = 75 ] && { log "chain5c: outage — yielding to supervisor"; exit 75; }; return 0; }

while leg_running round5b_chain.sh || leg_running round5_chain.sh; do
  log "older queue still running — waiting"
  sleep 300
done

KEEP=quality_runs/keep
JUDGE=$KEEP/x4_gan.ckpt

# ---- 1. flagship adversarial ramp on the best MSE base ---------------------
# keep/x4_scaled.ckpt is x4c (29.696/29.699 deploy, eval_r4.jsonl) — the
# true best x4. x4d (keep/x4_best.ckpt, 29.37/29.54) REGRESSED ~0.3 dB:
# the lr 1e-4 restart overshot the decayed-lr optimum (eval_r5 vs eval_r4
# rows, same corpus/denominators). Ramp from x4c, not x4d.
BASE=$(latest x4e); [ -n "$BASE" ] || BASE=$KEEP/x4_scaled.ckpt
if [ -e "$BASE" ]; then
  run x4_ramp_scaled 2700 --preset x4_ramp --ramp-epoch -1 \
    --checkpoint "$BASE" --dataset synthetic --synthetic-len 16384 \
    --batch-size 16 --num-epochs 2 --seed 62 \
    --content-extractor dfeat --dfeat-scale 0.3 --device-data; R $?
  XGS=$(latest x4_ramp_scaled)
  keep x4_gan_scaled "$XGS"
  commit_leg "chain r5c: adversarial ramp on the data-scaled base (train leg)" \
    quality_runs/keep/x4_gan_scaled.ckpt quality_runs/x4_ramp_scaled/train.log
  ev5 x4_ramp_scaled "$XGS" 1 --synthetic-len 32768 --fresh-n 64 \
    --dfeat-ckpt "$JUDGE"; R $?
  commit_leg "chain r5c: x4_ramp_scaled eval rows" "$EVAL"
fi

# ---- 2. x4e: low-lr continuation from x4c (x4d's lr 1e-4 regressed) --------
X4C=$KEEP/x4_scaled.ckpt
if [ -e "$X4C" ]; then
  run x4e 5400 --preset x2_mse --progressive-suffix 2 --checkpoint "$X4C" \
    --dataset synthetic --synthetic-len 32768 --batch-size 16 \
    --num-epochs 24 --lr 5e-5 --seed 61 --fused-steps 8 --device-data; R $?
  X4E=$(latest x4e)
  keep x4e "$X4E"
  commit_leg "chain r5c: x4e low-lr continuation (train leg)" \
    quality_runs/keep/x4e.ckpt quality_runs/x4e/train.log
  ev5 x4e "$X4E" 1 --synthetic-len 32768 --fresh-n 64 \
    --dfeat-ckpt "$JUDGE"; R $?
  commit_leg "chain r5c: x4e eval rows" "$EVAL"
fi

# ---- 3. refreshed green bench artifact -------------------------------------
log "bench.py refresh"
timeout 900 python bench.py > /tmp/bench5c.out 2>&1
rc=$?
log "bench rc=$rc $(grep -E '^\{' /tmp/bench5c.out | tail -1)"
commit_leg "chain r5c: refreshed green bench artifact" \
  quality_runs/bench_green_r5.json

log "round-5c chain done"
