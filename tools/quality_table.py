"""Aggregate tools/eval_quality.py JSONL lines into a markdown table.

Usage:
  python tools/quality_table.py quality_runs/eval_r2_fixed.jsonl \
      quality_runs/eval_r3.jsonl [--split heldout]
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl", nargs="+")
    ap.add_argument("--split", default=None,
                    help="only rows for this split (default: all)")
    args = ap.parse_args(argv)

    rows = []
    for path in args.jsonl:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
    if args.split:
        rows = [r for r in rows if r["split"] == args.split]

    has_int8 = any("psnr_int8" in r for r in rows)
    int8_h = " PSNR int8 | SSIM int8 |" if has_int8 else ""
    print("| run | split | scale | PSNR SR | PSNR deploy |" + int8_h +
          " PSNR bicubic | SSIM deploy | SSIM bicubic | beats bicubic |")
    print("|---|---|---|---|---|" + ("---|---|" if has_int8 else "") +
          "---|---|---|---|")
    for r in rows:
        if "psnr_int8" in r:
            int8_c = f" {r['psnr_int8']:.2f} | {r['ssim_int8']:.4f} |"
        else:
            int8_c = " — | — |" if has_int8 else ""
        # beats_bicubic keys on the recalibrated-BN fold when present (the
        # variant actually served); show the same number it was judged on
        if "psnr_deploy_recal" in r:
            dep = f"{r['psnr_deploy_recal']:.2f}*"
            dep_ssim = r["ssim_deploy_recal"]
        else:
            dep = f"{r['psnr_deploy']:.2f}"
            dep_ssim = r["ssim_deploy"]
        print(f"| {r['label']} | {r['split']} | x{r['scale']} "
              f"| {r['psnr_sr']:.2f} | {dep} |" + int8_c +
              f" {r['psnr_bicubic']:.2f} | {dep_ssim:.4f} "
              f"| {r['ssim_bicubic']:.4f} "
              f"| {'yes' if r['beats_bicubic'] else 'no'} |")
    if any("psnr_deploy_recal" in r for r in rows):
        print("\n`*` `--recalibrate-bn` fold (the variant beats_bicubic keys on)")


if __name__ == "__main__":
    main()
