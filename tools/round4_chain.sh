#!/bin/bash
# Round-4 on-chip queue: re-run the quality wave that round 3's outage
# cancelled (VERDICT r3 missing #1) with fixed failure semantics
# (VERDICT r3 next #2):
#
#   - cli.train exits 75 (EX_TEMPFAIL) when the TPU relay pre-flight fails;
#     a leg rc of 75 — or a `timeout` rc of 124 with a dead chip probe —
#     is an OUTAGE: the chain exits 75 immediately and the supervisor
#     retries the whole chain later. Outages never consume attempts and
#     never cancel downstream legs.
#   - any other nonzero rc is a REAL failure: it consumes one attempt
#     (quality_runs/<leg>.attempts); after $MAX_REAL_ATTEMPTS the leg is
#     marked permanently failed (quality_runs/<leg>.failed) and only then
#     may downstream legs be skipped.
#   - eval rows land in quality_runs/eval_r4.jsonl, guarded per (label,
#     split) so supervisor relaunches never duplicate rows or re-burn chip
#     time (ADVICE r3 medium).
#   - every completed leg is committed immediately (VERDICT r3 next #8).
#
# Legs (VERDICT r3 next #1, #4, #5, #7):
#   re-eval real_x2_v2 with BN recalibration; x4a growth -> x4b
#   continuation -> x4_ramp_dfeat (the headline x4 adversarial proof);
#   dfeat seed-robustness runs (seeds 71/72); real_x4_v2 finetune (+recal
#   eval); x8a progressive; x4c data-scale; fused-stem evidence re-run.
set -u
cd "$(dirname "$0")/.."
export SISR_SYNTH_CACHE_GB=30
LOG=quality_runs/watchdog.log
EVAL=quality_runs/eval_r4.jsonl
MAX_REAL_ATTEMPTS=${MAX_REAL_ATTEMPTS:-2}
log() { echo "[chain4] $(date -u +%Y-%m-%dT%H:%M:%SZ) $*" | tee -a "$LOG"; }

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

# A leg (train or eval) may already be IN FLIGHT from a previous chain
# invocation that was killed/relaunched around it (manual edits, outage
# recovery): detect via /proc cmdline markers and WAIT instead of starting
# a duplicate that would time-share the chip.
leg_running() {  # leg_running <marker substring>
  local p
  for p in /proc/[0-9]*/cmdline; do
    [ "$p" = "/proc/$$/cmdline" ] && continue
    tr '\0' ' ' < "$p" 2>/dev/null | grep -qF -- "$1" && return 0
  done
  return 1
}

wait_leg() {  # wait_leg <marker> <what>
  while leg_running "$1"; do
    log "$2: already in flight — waiting"; sleep 120
  done
}

commit_leg() {  # commit_leg <msg> <paths...> — index.lock-tolerant
  local msg=$1; shift
  for i in 1 2 3; do
    git add "$@" 2>/dev/null
    if git diff --cached --quiet 2>/dev/null; then return 0; fi
    git commit -q -m "$msg" 2>/dev/null && { log "committed: $msg"; return 0; }
    sleep 10
  done
  log "WARN commit failed: $msg"
}

# run <name> <timeout> <train-args...>
#   rc 0 = leg's checkpoint exists (trained now or earlier)
#   rc 75 = outage (caller must propagate: exit 75)
#   rc 1 = leg permanently failed
run() {
  local name=$1 tmo=$2; shift 2
  wait_leg "--write-root quality_runs/$name " "$name"
  if [ -n "$(latest "$name")" ]; then log "$name: done already, skip"; return 0; fi
  if [ -f "quality_runs/$name.failed" ]; then
    log "$name: permanently failed earlier, skip"; return 1; fi
  mkdir -p "quality_runs/$name"
  log "run $name: $*"
  timeout "$tmo" python -m sisr_tpu.cli.train "$@" \
    --write-root "quality_runs/$name" \
    >> "quality_runs/$name/train.log" 2>&1
  local rc=$?
  log "$name rc=$rc $(grep -E 'PSNR' "quality_runs/$name/train.log" | tail -1)"
  [ $rc -eq 0 ] && return 0
  if [ $rc -eq 75 ]; then log "$name: OUTAGE (pre-flight)"; return 75; fi
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
  return 75  # let the supervisor relaunch; next pass retries this leg
}

need() { [ -f "$1" ] && return 0; log "MISSING prereq $1 — skip $2"; return 1; }

keep() {
  [ -n "${2:-}" ] && [ -f "$2" ] && python tools/slim_ckpt.py "$2" \
    "quality_runs/keep/$1.ckpt" 2>&1 | tail -1 \
    | while read -r l; do log "keep: $l"; done
}

# ev <name> <n_suffixes> <eval-args...> — guarded by existing rows
ev() {
  local name=$1 suf=$2 ck; shift 2
  wait_leg "--label $name " "eval:$name"
  grep -q "\"label\": \"$name\"" "$EVAL" 2>/dev/null && return 0
  ck=$(latest "$name")
  [ -n "$ck" ] || return 0
  timeout 3600 python tools/eval_quality.py --checkpoint "$ck" \
    --n-suffixes "$suf" --label "$name" "$@" 2>/dev/null \
    | tee -a "$EVAL"
  commit_leg "chain r4: eval rows for $name" "$EVAL" \
    "quality_runs/$name/train.log"
}

# outage propagation wrapper: `R <leg-rc>` exits 75 on outage
R() { [ "$1" -eq 75 ] && { log "chain: outage — yielding to supervisor"; exit 75; }; return 0; }

mkdir -p quality_runs/keep
X2=quality_runs/keep/x2.ckpt
need "$X2" everything || exit 1

# ---- 0. weak-#3 fix evidence: re-eval real_x2_v2 with BN recalibration ----
DATA=quality_runs/real_data_v2
[ -d "$DATA/photos" ] || python tools/make_real_dataset.py --out "$DATA" \
  >> "$LOG" 2>&1
wait_leg "--label real_x2_v2_recal " "eval:real_x2_v2_recal"
if [ -e quality_runs/real_x2_v2/0 ] && \
   ! grep -q '"label": "real_x2_v2_recal"' "$EVAL" 2>/dev/null; then
  timeout 3600 python tools/eval_quality.py \
    --checkpoint quality_runs/real_x2_v2/0 --n-suffixes 0 \
    --label real_x2_v2_recal --dataset celeba --data-root "$DATA" \
    --fresh-root "$DATA/fresh" --recalibrate-bn 2>/dev/null | tee -a "$EVAL"
  commit_leg "chain r4: real_x2_v2 BN-recalibration eval rows" "$EVAL"
fi

# ---- 1. x4 rebuild: growth (wave-1 recipe) + low-LR continuation ----------
run x4a 7200 --preset x2_mse --progressive-suffix 1 --checkpoint "$X2" \
  --dataset synthetic --synthetic-len 8192 --batch-size 16 \
  --num-epochs 40 --lr 2e-4 --seed 45 --fused-steps 8; R $?
X4A=$(latest x4a)
keep x4a "$X4A"
commit_leg "chain r4: x4a growth leg done" quality_runs/keep/x4a.ckpt \
  quality_runs/x4a/train.log
[ -n "$X4A" ] || { [ -f quality_runs/keep/x4a.ckpt ] && X4A=quality_runs/keep/x4a.ckpt; }

if need "$X4A" x4-continuation; then
  run x4b 7200 --preset x2_mse --progressive-suffix 2 --checkpoint "$X4A" \
    --dataset synthetic --synthetic-len 8192 --batch-size 16 \
    --num-epochs 40 --lr 5e-5 --seed 52 --fused-steps 8; R $?
fi
X4=$(latest x4b)
keep x4 "$X4"
ev x4b 1 --synthetic-len 8192 --fresh-n 64
commit_leg "chain r4: x4b continuation leg done" quality_runs/keep/x4.ckpt \
  quality_runs/x4b/train.log
[ -n "$X4" ] || { [ -f quality_runs/keep/x4.ckpt ] && X4=quality_runs/keep/x4.ckpt; }

# ---- 2. x4 adversarial ramp with dfeat — THE headline missing artifact ----
if need "$X4" x4_ramp_dfeat; then
  # ramp -1 = one identity epoch after resume, then adversarial+content —
  # robust to the rebuilt lineage's epoch count (windows are ABSOLUTE:
  # round-2's hardcoded 161 only worked because that lineage sat at 160)
  run x4_ramp_dfeat 7200 --preset x4_ramp --ramp-epoch -1 --checkpoint "$X4" \
    --dataset synthetic --synthetic-len 8192 --batch-size 16 \
    --num-epochs 4 --seed 50 --content-extractor dfeat --dfeat-scale 0.3; R $?
  ev x4_ramp_dfeat 1 --synthetic-len 8192 --fresh-n 64
  keep x4_gan "$(latest x4_ramp_dfeat)"
  commit_leg "chain r4: x4_ramp_dfeat adversarial leg done" \
    quality_runs/keep/x4_gan.ckpt quality_runs/x4_ramp_dfeat/train.log
fi

# ---- 3. dfeat seed robustness (VERDICT r3 next #7): 2 more seeds ---------
for SEED in 71 72; do
  run "x2_gan_dfeat_s$SEED" 7200 --preset x2_gan --checkpoint "$X2" \
    --dataset synthetic --synthetic-len 2048 --batch-size 16 \
    --num-epochs 10 --seed "$SEED" --content-extractor dfeat \
    --dfeat-scale 0.3; R $?
  ev "x2_gan_dfeat_s$SEED" 0 --synthetic-len 2048 --fresh-n 64
done

# ---- 4. real-photo x4 finetune on the grown corpus ------------------------
if need "$X4" real_x4_v2; then
  run real_x4_v2 7200 --preset x2_mse --progressive-suffix 2 --checkpoint "$X4" \
    --dataset celeba --data-root "$DATA" --batch-size 16 \
    --num-epochs 60 --lr 1e-4 --seed 65 --fused-steps 8 --augment-dihedral; R $?
  ev real_x4_v2 1 --dataset celeba --data-root "$DATA" \
    --fresh-root "$DATA/fresh" --recalibrate-bn
  keep real_x4 "$(latest real_x4_v2)"
  commit_leg "chain r4: real_x4_v2 finetune leg done" \
    quality_runs/keep/real_x4.ckpt quality_runs/real_x4_v2/train.log
fi

# ---- 5. tail: x8 progressive + x4 data-scaled continuation ----------------
if need "$X4" x8-prog; then
  run x8a 7200 --preset x2_mse --progressive-suffix 3 --checkpoint "$X4" \
    --dataset synthetic --synthetic-len 2048 --batch-size 16 \
    --num-epochs 80 --lr 2e-4 --seed 49 --fused-steps 8; R $?
  ev x8a 2 --synthetic-len 2048 --fresh-n 64
  keep x8 "$(latest x8a)"
  commit_leg "chain r4: x8a progressive leg done" quality_runs/keep/x8.ckpt \
    quality_runs/x8a/train.log
fi
if need "$X4" x4-data-scale; then
  run x4c 14400 --preset x2_mse --progressive-suffix 2 --checkpoint "$X4" \
    --dataset synthetic --synthetic-len 32768 --batch-size 16 \
    --num-epochs 8 --lr 1e-4 --seed 53 --fused-steps 8; R $?
  ev x4c 1 --synthetic-len 32768 --fresh-n 64
  keep x4_scaled "$(latest x4c)"
  commit_leg "chain r4: x4c data-scale leg done" \
    quality_runs/keep/x4_scaled.ckpt quality_runs/x4c/train.log
fi

# ---- 6. fused-stem evidence re-run (VERDICT r3 next #5) --------------------
if [ ! -s quality_runs/perf_r3/fused_stem.jsonl ]; then
  log "fused-stem bench re-run"
  mkdir -p quality_runs/perf_r3
  timeout 3600 python tools/bench_fused_stem.py \
    2>quality_runs/perf_r3/fused_stem.err \
    | tee quality_runs/perf_r3/fused_stem.jsonl
  log "fused-stem rc=$?"
  [ -s quality_runs/perf_r3/fused_stem.jsonl ] && \
    commit_leg "chain r4: fused-stem evidence re-captured" \
      quality_runs/perf_r3/fused_stem.jsonl
fi

log "round-4 chain done"
