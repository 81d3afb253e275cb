#!/bin/bash
# Round-5b on-chip queue (final wave): push the strongest x4 lineage.
# x4c (data-scale, 32768 imgs, 8 epochs) reached 29.70 dB deploy vs
# bicubic 27.77 (+1.9 dB) — far above the x4b base (+0.7 dB) the flagship
# ramp was built on, and its PSNR curve was still climbing ~0.03 dB/epoch
# at cutoff. This wave:
#   1. x4d: +24 epochs on the 32768-img corpus (lr 1e-4, device-resident
#      corpus so the relay-upload leak stays flat — BENCH_NOTES round 5)
#   2. x4e: +24 more at lr 5e-5 (decay restarts per-run, reference
#      config.py:170-180 semantics)
#   3. x4_ramp_scaled: the flagship adversarial ramp (preset x4_ramp,
#      reference config.py:124-166 + README.md:55) + dfeat on the best
#      MSE base — the GAN row with the strongest PSNR floor
#   4. perceptual eval rows for all three vs the SAME fixed dfeat judge
#      as the other eval_r5 rows (keep/x4_gan.ckpt)
#   5. a refreshed green bench artifact
# Failure semantics identical to round5_chain.sh: rc 75, or rc 124 with a
# dead chip probe or a bench pause overlapping the leg => OUTAGE (retry,
# no attempt consumed); other nonzero => real failure, 2 attempts max.
set -u
cd "$(dirname "$0")/.."
export SISR_SYNTH_CACHE_GB=30
LOG=quality_runs/watchdog.log
EVAL=quality_runs/eval_r5.jsonl
MAX_REAL_ATTEMPTS=${MAX_REAL_ATTEMPTS:-2}
log() { echo "[chain5b] $(date -u +%Y-%m-%dT%H:%M:%SZ) $*" | tee -a "$LOG"; }

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
    && commit_leg "chain r5b: eval rows for $label" "$EVAL"
}

R() { [ "$1" = 75 ] && { log "chain5b: outage — yielding to supervisor"; exit 75; }; return 0; }

# ---- wait out any round-5 machinery still running --------------------------
while leg_running round5_supervisor.sh || leg_running round5_chain.sh; do
  log "round-5 queue still running — waiting"
  sleep 300
done

KEEP=quality_runs/keep
JUDGE=$KEEP/x4_gan.ckpt

# ---- 1. x4d: +24 epochs on the 32768-img corpus, lr 1e-4 ------------------
X4C=$(latest x4c); [ -n "$X4C" ] || X4C=$KEEP/x4_scaled.ckpt
if [ -e "$X4C" ]; then
  run x4d 12600 --preset x2_mse --progressive-suffix 2 --checkpoint "$X4C" \
    --dataset synthetic --synthetic-len 32768 --batch-size 16 \
    --num-epochs 24 --lr 1e-4 --seed 60 --fused-steps 8 --device-data; R $?
  X4D=$(latest x4d)
  keep x4_best "$X4D"
  ev5 x4d "$X4D" 1 --synthetic-len 32768 --fresh-n 64 \
    --dfeat-ckpt "$JUDGE"; R $?
  commit_leg "chain r5b: x4d data-scale continuation" \
    quality_runs/keep/x4_best.ckpt quality_runs/x4d/train.log "$EVAL"
fi

# ---- 2. x4e: +24 more at lr 5e-5 -------------------------------------------
X4D=$(latest x4d); [ -n "$X4D" ] || X4D=$KEEP/x4_best.ckpt
if [ -e "$X4D" ]; then
  run x4e 12600 --preset x2_mse --progressive-suffix 2 --checkpoint "$X4D" \
    --dataset synthetic --synthetic-len 32768 --batch-size 16 \
    --num-epochs 24 --lr 5e-5 --seed 61 --fused-steps 8 --device-data; R $?
  X4E=$(latest x4e)
  keep x4_best "$X4E"
  ev5 x4e "$X4E" 1 --synthetic-len 32768 --fresh-n 64 \
    --dfeat-ckpt "$JUDGE"; R $?
  commit_leg "chain r5b: x4e low-lr continuation" \
    quality_runs/keep/x4_best.ckpt quality_runs/x4e/train.log "$EVAL"
fi

# ---- 3. flagship adversarial ramp on the strongest MSE base ----------------
BASE=$(latest x4e); [ -n "$BASE" ] || BASE=$(latest x4d)
[ -n "$BASE" ] || BASE=$KEEP/x4_best.ckpt
if [ -e "$BASE" ]; then
  # no --device-data: the GAN step adds D-update activations + dfeat on
  # top of the 1.6 GB replay ring; keep the 6.4 GB corpus out of HBM
  run x4_ramp_scaled 10800 --preset x4_ramp --ramp-epoch -1 \
    --checkpoint "$BASE" --dataset synthetic --synthetic-len 32768 \
    --batch-size 16 --num-epochs 4 --seed 62 \
    --content-extractor dfeat --dfeat-scale 0.3; R $?
  XGS=$(latest x4_ramp_scaled)
  keep x4_gan_scaled "$XGS"
  ev5 x4_ramp_scaled "$XGS" 1 --synthetic-len 32768 --fresh-n 64 \
    --dfeat-ckpt "$JUDGE"; R $?
  commit_leg "chain r5b: adversarial ramp on the data-scaled base" \
    quality_runs/keep/x4_gan_scaled.ckpt quality_runs/x4_ramp_scaled/train.log \
    "$EVAL"
fi

# ---- 4. refreshed green bench artifact --------------------------------------
log "bench.py refresh"
timeout 900 python bench.py > /tmp/bench5b.out 2>&1
rc=$?
log "bench rc=$rc $(grep -E '^\{' /tmp/bench5b.out | tail -1)"
commit_leg "chain r5b: refreshed green bench artifact" \
  quality_runs/bench_green_r5.json

log "round-5b chain done"
