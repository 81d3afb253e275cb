#!/bin/bash
# Round-3 on-chip queue, REBUILT for the no-checkpoints reality: the VM
# reset between rounds dropped every gitignored quality_runs/*/0, so the
# original round3_chain's "continuation" legs had no base to resume from
# (x4_v5 silently trained from scratch against a missing --checkpoint —
# caught and killed 2026-08-18 21:4x, see watchdog.log).
#
# Differences from round3_chain.sh:
#   - every leg that needs a base checkpoint GUARDS on its existence and
#     skips loudly instead of training garbage from scratch;
#   - the foundation (x2 base, x2->x4 growth, x4 continuation) is rebuilt
#     first with round-2's exact recipes (wave-1/2 flags);
#   - milestone checkpoints are slimmed (tools/slim_ckpt.py) into
#     quality_runs/keep/*.ckpt, which is NOT gitignored — the foundation
#     survives the next VM reset;
#   - legs are idempotent: finished outputs are skipped on relaunch, so
#     the watchdog can re-arm this script after a relay outage.
set -u
cd "$(dirname "$0")/.."
export SISR_SYNTH_CACHE_GB=30
LOG=quality_runs/watchdog.log
log() { echo "[chain3b] $(date -u +%Y-%m-%dT%H:%M:%SZ) $*" | tee -a "$LOG"; }

# persistent compilation cache (canary-gated, as round3_chain.sh)
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
  log "compilation cache armed at $CACHE"
else
  log "compilation cache canary failed — running without"
fi

# checkpoints are pure-numeric filenames (next_write_path); the naive
# [0-9]* glob also matched 0_panel.png / 0.gif and handed a PNG to
# --checkpoint (caught 22:24Z — every downstream leg crashed fast)
latest() {
  ls -v "quality_runs/$1" 2>/dev/null | grep -E '^[0-9]+$' | tail -1 \
    | sed "s|^|quality_runs/$1/|"
}

# run <name> <timeout> [train args...] — skipped if the leg already has a
# checkpoint; appends to the leg log so relaunches keep history.
run() {
  local name=$1 tmo=$2; shift 2
  if [ -n "$(latest "$name")" ]; then log "$name: done already, skip"; return 0; fi
  mkdir -p "quality_runs/$name"
  log "run $name: $*"
  timeout "$tmo" python -m sisr_tpu.cli.train "$@" \
    --write-root "quality_runs/$name" \
    >> "quality_runs/$name/train.log" 2>&1
  log "$name rc=$? $(grep -E 'PSNR' "quality_runs/$name/train.log" | tail -1)"
}

# need <ckpt> <legname> — guard: returns 1 (and logs) when the base is gone
need() { [ -f "$1" ] && return 0; log "MISSING prereq $1 — skip $2"; return 1; }

keep() {  # keep <name> <ckpt> — slim + persist for future rounds
  [ -f "$2" ] && python tools/slim_ckpt.py "$2" "quality_runs/keep/$1.ckpt" \
    2>&1 | tail -1 | while read -r l; do log "keep: $l"; done
}

ev() {  # ev <name> <n_suffixes> [extra eval args...]
  local name=$1 suf=$2 ck; shift 2
  ck=$(latest "$name")
  [ -n "$ck" ] && \
    timeout 2400 python tools/eval_quality.py --checkpoint "$ck" \
      --n-suffixes "$suf" --label "$name" "$@" 2>/dev/null \
      | tee -a quality_runs/eval_r3.jsonl
}

# ---- 0. green bench (idempotent: re-capture only while the best green
# value on record looks degraded — the relay alternates healthy/degraded
# windows; see BENCH_NOTES round 3 "relay pathology") --------------------
bench_healthy() {
  python - <<'EOF'
import json, sys
try:
    v = json.load(open("quality_runs/bench_green_r3.json"))["value"]
    sys.exit(0 if (v or 0) >= 5.0 else 1)
except Exception:
    sys.exit(1)
EOF
}
if ! bench_healthy; then
  log "capturing bench"
  timeout 2400 python bench.py 2>/tmp/bench_r3.err > /tmp/bench_r3.json
  grep -q '"value": null' /tmp/bench_r3.json || cp /tmp/bench_r3.json quality_runs/bench_green_r3.json
  log "bench rc=$? $(tail -c 160 quality_runs/bench_green_r3.json)"
fi

# ---- 1. x2 base (wave-1 recipe: 80-epoch MSE, seed 42) --------------------
# --lr 2e-4 is load-bearing: TrainConfig.lr defaults to the reference's
# GAN lr (1e-5, config.py:38); the wave-1 MSE pretrain ran at 2e-4 (first
# rebuild attempt at the default plateaued 4 dB low — x2r3_lr1e5).
run x2r3 4800 --preset x2_mse \
  --dataset synthetic --synthetic-len 2048 --batch-size 16 \
  --num-epochs 80 --lr 2e-4 --seed 42 --fused-steps 8
X2=$(latest x2r3)
keep x2 "$X2"
ev x2r3 0 --synthetic-len 2048 --fresh-n 64

# ---- 2. dfeat scale calibration (x2 base + 4 adversarial epochs) ----------
if need "$X2" dfeat-sweep; then
  for s in 0.3 1 10 100; do
    run "x2_dfeat_s$s" 3600 --preset x2_gan --checkpoint "$X2" \
      --dataset synthetic --synthetic-len 2048 --batch-size 16 \
      --num-epochs 4 --seed 44 --content-extractor dfeat --dfeat-scale "$s"
    ev "x2_dfeat_s$s" 0 --synthetic-len 2048 --fresh-n 64
  done
fi

BEST=$(python - <<'EOF'
import json, os
# Selection rule: the SMALLEST dfeat scale whose held-out deploy PSNR
# still matches bicubic — i.e. maximal adversarial freedom subject to not
# losing the content anchor (a huge scale trivially maxes PSNR by turning
# the recipe into an MSE finetune, defeating the point of the GAN row).
# Fallback when no scale clears bicubic: the max-PSNR scale.
rows = []
if os.path.exists("quality_runs/eval_r3.jsonl"):
    for line in open("quality_runs/eval_r3.jsonl"):
        try: r = json.loads(line)
        except Exception: continue
        if r.get("split") == "heldout" and r.get("label", "").startswith("x2_dfeat_s"):
            rows.append((float(r["label"].split("_s")[1]),
                         r["psnr_deploy"], r.get("psnr_bicubic", 28.9)))
ok = [s for s, p, b in rows if p >= b - 0.05]
if ok:
    print(min(ok))
elif rows:
    print(max(rows, key=lambda t: t[1])[0])
else:
    print(1)  # calibration fallback: gradient matching says O(1)
EOF
)
log "dfeat calibration winner: scale $BEST"

# ---- 3. full x2_gan recipe with dfeat (the 23.70-dB round-2 row redone) ---
if need "$X2" x2_gan_dfeat; then
  run x2_gan_dfeat 7200 --preset x2_gan --checkpoint "$X2" \
    --dataset synthetic --synthetic-len 2048 --batch-size 16 \
    --num-epochs 10 --seed 44 --content-extractor dfeat --dfeat-scale "$BEST"
  ev x2_gan_dfeat 0 --synthetic-len 2048 --fresh-n 64
fi

# ---- 3b. control: same base/seed/epochs, fixed-random extractor ----------
# makes the dfeat A/B self-contained in round 3 (round-2's 23.70-dB
# x2_gan row came from a different base checkpoint)
if need "$X2" x2_gan_rand; then
  run x2_gan_rand 7200 --preset x2_gan --checkpoint "$X2" \
    --dataset synthetic --synthetic-len 2048 --batch-size 16 \
    --num-epochs 10 --seed 44
  ev x2_gan_rand 0 --synthetic-len 2048 --fresh-n 64
fi

# ---- 4. perf wave (bounded measurements; VERDICT r2 next #3/#4) -----------
mkdir -p quality_runs/perf_r3
if [ ! -s quality_runs/perf_r3/l01_layouts.jsonl ]; then
  log "l0/l1/l3 layout sweep"
  timeout 3600 python tools/bench_l01_layouts.py \
    2>quality_runs/perf_r3/l01_layouts.err | tee quality_runs/perf_r3/l01_layouts.jsonl
  log "layout sweep rc=$?"
fi
if [ ! -s quality_runs/perf_r3/fused_stem.jsonl ]; then
  log "fused-stem kernel re-attempt"
  timeout 3600 python tools/bench_fused_stem.py \
    2>quality_runs/perf_r3/fused_stem.err | tee quality_runs/perf_r3/fused_stem.jsonl
  log "fused stem rc=$?"
fi
if [ ! -s quality_runs/perf_r3/infer_roofline.jsonl ]; then
  log "infer roofline"
  timeout 3600 python tools/infer_roofline.py \
    2>quality_runs/perf_r3/infer_roofline.err | tee quality_runs/perf_r3/infer_roofline.jsonl
  log "infer roofline rc=$?"
fi

# ---- 5. x4 rebuild: growth (wave-1) + low-LR continuation (wave-2) --------
if need "$X2" x4-growth; then
  # --lr 2e-4 as the wave-1 growth leg (same MSE-pretrain lr as the x2
  # base and the equal-budget x4_scratch comparison; the config default
  # 1e-5 is the reference's GAN lr — see the x2r3 note above)
  run x4a 7200 --preset x2_mse --progressive-suffix 1 --checkpoint "$X2" \
    --dataset synthetic --synthetic-len 8192 --batch-size 16 \
    --num-epochs 40 --lr 2e-4 --seed 45 --fused-steps 8
fi
X4A=$(latest x4a)
if need "$X4A" x4-continuation; then
  run x4b 7200 --preset x2_mse --progressive-suffix 2 --checkpoint "$X4A" \
    --dataset synthetic --synthetic-len 8192 --batch-size 16 \
    --num-epochs 40 --lr 5e-5 --seed 52 --fused-steps 8
fi
X4=$(latest x4b)
keep x4 "$X4"
ev x4b 1 --synthetic-len 8192 --fresh-n 64

# ---- 6. x4 adversarial ramp with dfeat (round-2 anchor: x4_ramp 22.87) ----
if need "$X4" x4_ramp_dfeat; then
  run x4_ramp_dfeat 7200 --preset x4_ramp --ramp-epoch 161 --checkpoint "$X4" \
    --dataset synthetic --synthetic-len 8192 --batch-size 16 \
    --num-epochs 4 --seed 50 --content-extractor dfeat --dfeat-scale "$BEST"
  ev x4_ramp_dfeat 1 --synthetic-len 8192 --fresh-n 64
fi

# ---- 7. grown real-photo corpus (VERDICT r2 next #7) ----------------------
DATA=quality_runs/real_data_v2
[ -d "$DATA/photos" ] || python tools/make_real_dataset.py --out "$DATA"

if need "$X2" real_x2_v2; then
  run real_x2_v2 7200 --preset x2_mse --checkpoint "$X2" \
    --dataset celeba --data-root "$DATA" --batch-size 16 \
    --num-epochs 60 --lr 1e-4 --seed 64 --fused-steps 8 --augment-dihedral
  ev real_x2_v2 0 --dataset celeba --data-root "$DATA" --fresh-root "$DATA/fresh"
fi
if need "$X4" real_x4_v2; then
  run real_x4_v2 7200 --preset x2_mse --progressive-suffix 2 --checkpoint "$X4" \
    --dataset celeba --data-root "$DATA" --batch-size 16 \
    --num-epochs 60 --lr 1e-4 --seed 65 --fused-steps 8 --augment-dihedral
  ev real_x4_v2 1 --dataset celeba --data-root "$DATA" --fresh-root "$DATA/fresh"
fi

# ---- 8. optional tail: x8 progressive + x4 data-scaled continuation -------
if need "$X4" x8-prog; then
  run x8a 7200 --preset x2_mse --progressive-suffix 3 --checkpoint "$X4" \
    --dataset synthetic --synthetic-len 2048 --batch-size 16 \
    --num-epochs 80 --lr 2e-4 --seed 49 --fused-steps 8
  ev x8a 2 --synthetic-len 2048 --fresh-n 64
  keep x8 "$(latest x8a)"
fi
if need "$X4" x4-data-scale; then
  run x4c 14400 --preset x2_mse --progressive-suffix 2 --checkpoint "$X4" \
    --dataset synthetic --synthetic-len 32768 --batch-size 16 \
    --num-epochs 8 --lr 1e-4 --seed 53 --fused-steps 8
  ev x4c 1 --synthetic-len 32768 --fresh-n 64
  keep x4_scaled "$(latest x4c)"
fi

log "round-3b chain done"
