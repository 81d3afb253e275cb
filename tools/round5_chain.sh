#!/bin/bash
# Round-5 on-chip queue: runs AFTER the round-4 supervisor resolves its
# legs (x8a/x4c tail). Addresses VERDICT r4:
#   #3 serving design-point measurements (trunk_v2 + fused_stem evidence)
#   #4 perceptual-metric table for the flagship GAN recipe (dfeat judge)
#   #5 x4a eval rows (growth-lineage record)
#   #6 train-throughput swing: b64 batch point
#   #7 leak probe (host-RSS growth evidence)
#   #8 a green bench artifact committed in-round (bench_green_r5.json)
#
# Failure semantics (round-4 chain + the new pause rule, VERDICT #1c):
#   rc 75, or rc 124 with a dead chip probe, or rc 124 with a bench pause
#   marker newer than the leg's start => OUTAGE (retry forever, never
#   consume attempts). Other nonzero rc => real failure, 2 attempts max.
set -u
cd "$(dirname "$0")/.."
export SISR_SYNTH_CACHE_GB=30
LOG=quality_runs/watchdog.log
EVAL=quality_runs/eval_r5.jsonl
MAX_REAL_ATTEMPTS=${MAX_REAL_ATTEMPTS:-2}
log() { echo "[chain5] $(date -u +%Y-%m-%dT%H:%M:%SZ) $*" | tee -a "$LOG"; }

# ---- swap guard: the relay client retains every unique h2d upload
# (~2.6 GB/epoch on real-data legs; real_x4_v2 reached 99 GB RSS). Long
# legs need the cold leaked pages swappable or the host OOMs mid-leg.
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

# rc=124 while/after a bench pause is an OUTAGE: GNU timeout's wall clock
# kept ticking through the SIGSTOP (VERDICT r4 next #1c). A pause marker
# (stamped by bench.py resume() / the rescuer) newer than the leg start,
# or a still-live pause file, counts.
paused_during() {  # paused_during <leg_start_epoch_s>
  [ -f /tmp/sisr_bench_paused.pids ] && return 0
  [ -f /tmp/sisr_bench_last_pause ] || return 1
  local t
  t=$(cat /tmp/sisr_bench_last_pause 2>/dev/null || echo 0)
  [ "${t:-0}" -ge "$1" ]
}

# run <name> <timeout> <train-args...> — training leg (round-4 semantics
# + the pause-outage rule)
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

# tool <name> <timeout> <outfile> <cmd...>: perf-capture leg with the same
# outage/attempt semantics as training legs; output tee'd to <outfile>.
tool() {
  local name=$1 tmo=$2 out=$3; shift 3
  [ -s "$out" ] && { log "$name: artifact exists, skip"; return 0; }
  [ -f "quality_runs/$name.failed" ] && { log "$name: failed earlier"; return 1; }
  local t0; t0=$(date +%s)
  log "run $name: $*"
  mkdir -p "$(dirname "$out")"
  timeout "$tmo" "$@" 2>"${out%.jsonl}.err" | tee "$out.tmp"
  local rc=${PIPESTATUS[0]}  # timeout's rc, not tee's
  if [ $rc -eq 0 ] && [ -s "$out.tmp" ]; then
    mv "$out.tmp" "$out"; log "$name rc=0"; return 0
  fi
  rm -f "$out.tmp"
  log "$name rc=$rc"
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

# ev5 <label> <ckpt> <n_suffixes> <eval-args...> — guarded by existing rows
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
    && commit_leg "chain r5: eval rows for $label" "$EVAL"
}

R() { [ "$1" = 75 ] && { log "chain5: outage — yielding to supervisor"; exit 75; }; return 0; }

# ---- wait out the round-4 machinery (supervisor + chain + its legs) ----
while leg_running round4_supervisor.sh || leg_running round4_chain.sh \
      || leg_running mnist_dfeat_r4b.sh; do
  log "round-4 queue still running — waiting"
  sleep 300
done
# the round-4 post_chain_bench waits on a wedged wrapper pid and would
# double-run the perf captures; retire it (its job moved into this chain)
if [ -f /tmp/postbench.pid ]; then
  kill "$(cat /tmp/postbench.pid)" 2>/dev/null && log "retired stale postbench"
fi

KEEP=quality_runs/keep
DATA=quality_runs/real_data_v2
JUDGE=$KEEP/x4_gan.ckpt

# ---- 1. x4a eval rows (VERDICT #5: growth-lineage record) -----------------
X4A=$(latest x4a); [ -n "$X4A" ] || X4A=$KEEP/x4a.ckpt
ev5 x4a "$X4A" 1 --synthetic-len 8192 --fresh-n 64; R $?

# ---- 2. perceptual table: MSE base vs adversarial ramp, fixed dfeat judge -
X4=$(latest x4b); [ -n "$X4" ] || X4=$KEEP/x4.ckpt
XG=$(latest x4_ramp_dfeat); [ -n "$XG" ] || XG=$KEEP/x4_gan.ckpt
ev5 x4b_perc "$X4" 1 --synthetic-len 8192 --fresh-n 64 \
  --dfeat-ckpt "$JUDGE"; R $?
ev5 x4_ramp_dfeat_perc "$XG" 1 --synthetic-len 8192 --fresh-n 64 \
  --dfeat-ckpt "$JUDGE"; R $?

# ---- 3. real-photo x4 perceptual + recal rows ------------------------------
# VM resets wipe the gitignored run dirs AND the corpus: fall back to the
# committed slim keep/real_x4.ckpt and regenerate the deterministic corpus.
if [ ! -d "$DATA/photos" ]; then
  timeout 900 python tools/make_real_dataset.py --out "$DATA" >/dev/null 2>&1 \
    && log "real_data_v2 regenerated" || log "WARN: corpus regen failed"
fi
RX4=$(latest real_x4_v2); [ -n "$RX4" ] || RX4=$KEEP/real_x4.ckpt
if [ -e "$RX4" ] && [ -d "$DATA/photos" ]; then
  ev5 real_x4_v2_perc "$RX4" 1 --dataset celeba --data-root "$DATA" \
    --fresh-root "$DATA/fresh" --recalibrate-bn --dfeat-ckpt "$JUDGE"; R $?
fi

# ---- 3b. x8 adversarial ramp: quantify the reference's documented x8 GAN
# failure mode (reference README.md:74-75: MSE => blur, GAN => invented
# detail) on the perceptual axis — grad_ratio/hf_ratio should jump toward
# 1 while PSNR drops vs the MSE x8 base. Runs once chain4's x8a exists.
X8=$(latest x8a); { [ -n "$X8" ] && [ -e "$X8" ]; } || X8=$KEEP/x8.ckpt
if [ -e "$X8" ]; then
  ev5 x8a_perc "$X8" 2 --synthetic-len 2048 --fresh-n 64 \
    --dfeat-ckpt "$JUDGE"; R $?
  run x8_ramp_dfeat 7200 --preset x4_ramp --ramp-epoch -1 \
    --progressive-suffix 4 --checkpoint "$X8" --dataset synthetic \
    --synthetic-len 2048 --batch-size 16 --num-epochs 4 --seed 57 \
    --content-extractor dfeat --dfeat-scale 0.3; R $?
  ev5 x8_ramp_dfeat "$(latest x8_ramp_dfeat)" 2 --synthetic-len 2048 \
    --fresh-n 64 --dfeat-ckpt "$JUDGE"; R $?
  commit_leg "chain r5: x8 adversarial ramp leg" \
    quality_runs/x8_ramp_dfeat/train.log
fi

# ---- 4. perf captures (VERDICT #3, #6a, #7) --------------------------------
mkdir -p quality_runs/perf_r5
tool trunk_v2 5400 quality_runs/perf_r4/trunk_v2.jsonl \
  python tools/bench_trunk_v2.py; R $?
commit_leg "chain r5: trunk-v2 serving design points measured" \
  quality_runs/perf_r4/trunk_v2.jsonl

if [ ! -s quality_runs/perf_r3/fused_stem.jsonl ]; then
  tool fused_stem 3600 quality_runs/perf_r3/fused_stem.jsonl \
    python tools/bench_fused_stem.py; R $?
  commit_leg "chain r5: fused-stem evidence re-captured" \
    quality_runs/perf_r3/fused_stem.jsonl
fi

tool train_b64 5400 quality_runs/perf_r5/train_b64.jsonl \
  python tools/bench_train_b64.py; R $?
commit_leg "chain r5: b64 train batch point" quality_runs/perf_r5/train_b64.jsonl

tool leak_probe 1200 quality_runs/perf_r5/leak_probe.jsonl \
  python tools/leak_probe.py; R $?
commit_leg "chain r5: relay upload-retention probe" \
  quality_runs/perf_r5/leak_probe.jsonl

# s2d stride-2 ladder, l1/l3/l5 (VERDICT #6b: extend the formal bound to
# the full ladder — l1 was measured round 3, l3/l5 were not)
tool s2d_ladder 3600 quality_runs/perf_r5/s2d_ladder.jsonl \
  python tools/bench_s2d_conv.py; R $?
commit_leg "chain r5: s2d ladder measurement l1/l3/l5" \
  quality_runs/perf_r5/s2d_ladder.jsonl

# ---- 5. green bench artifact (VERDICT #8; also warms the driver's cache) --
if [ ! -s quality_runs/bench_green_r5.json ]; then
  log "bench.py green capture"
  timeout 900 python bench.py > /tmp/bench_r5.out 2>/tmp/bench_r5.err
  log "bench rc=$? $(tail -1 /tmp/bench_r5.out)"
  # bench.py writes quality_runs/bench_green_r5.json itself on a full
  # (non-partial) capture
  [ -s quality_runs/bench_green_r5.json ] && \
    commit_leg "chain r5: green bench artifact" quality_runs/bench_green_r5.json
fi

log "round-5 chain done"
