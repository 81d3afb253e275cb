#!/bin/bash
# Round-2 closing measurements, run on the real chip after the quality
# waves finish (chained on the wave supervisor pid):
# 1. deploy-path variant sweep incl. the new int8 quantized path
# 2. int8 quality deltas on the trained x2 and x4 checkpoints
# 3. per-layer D-ladder re-measure with the fixed (chained, no-DCE)
#    methodology from tools/_bench_util.py
# 4. a fresh bench.py headline
set -u
cd "$(dirname "$0")/.."
OUT=quality_runs/post_wave
mkdir -p "$OUT"

echo "=== deploy variants (b16/b64, xla/trunk/int8)"
timeout 2400 python tools/bench_deploy_variants.py \
  --variants xla trunk int8 int8_fp_ends \
  > "$OUT/deploy_variants.log" 2>&1
echo "rc=$?"

echo "=== int8 quality: x2"
timeout 1200 python tools/eval_quality.py --checkpoint quality_runs/x2/0 \
  --n-suffixes 0 --synthetic-len 2048 --label x2_int8 --quant \
  > "$OUT/int8_quality_x2.log" 2>&1
echo "rc=$?"

echo "=== int8 quality: x4_v3"
timeout 1200 python tools/eval_quality.py --checkpoint quality_runs/x4_v3/0 \
  --n-suffixes 1 --synthetic-len 8192 --label x4_v3_int8 --quant \
  > "$OUT/int8_quality_x4.log" 2>&1
echo "rc=$?"

echo "=== re-eval all checkpoints with HIGHEST-precision SSIM"
# build into a temp file and swap in only if every eval succeeded, so a
# partial rerun can't clobber the README table's source of truth
TMP=quality_runs/eval_r2_fixed.jsonl.new
: > "$TMP"
EVAL_OK=1
for spec in x2:0:2048 x2_gan:0:2048 x2_gan4:0:2048 x2_gan_pix:0:2048 \
            x4_prog:1:2048 x4_v2:1:8192 x4_v3:1:8192 x4_scratch:1:8192 \
            x4_ramp:1:8192 x8_prog:2:2048 x8_unsup:2:2048; do
  IFS=: read name suf len <<< "$spec"
  [ -f "quality_runs/$name/0" ] || continue
  if ! timeout 1200 python tools/eval_quality.py \
      --checkpoint "quality_runs/$name/0" \
      --n-suffixes "$suf" --synthetic-len "$len" --label "$name" \
      2> "$OUT/eval_$name.err" | grep '^{' | tee -a "$TMP"; then
    echo "eval $name FAILED (see $OUT/eval_$name.err)"; EVAL_OK=0
  fi
done
if [ "$EVAL_OK" = 1 ]; then
  mv "$TMP" quality_runs/eval_r2_fixed.jsonl
else
  echo "keeping previous eval_r2_fixed.jsonl; partial results in $TMP"
fi

echo "=== per-layer D ladder (fixed methodology)"
timeout 2400 python tools/bench_d_layers.py > "$OUT/d_layers.log" 2>&1
echo "rc=$?"

echo "=== bench.py"
timeout 3600 python bench.py > "$OUT/bench.log" 2>&1
echo "rc=$?"

echo "=== post-wave bench done"
