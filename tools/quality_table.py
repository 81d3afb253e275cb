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
    # perceptual columns (grad_ratio -> 1 is better; dfeat distance lower
    # is better) when any row carries them (eval_quality r5+)
    has_perc = any("grad_ratio_deploy" in r for r in rows)
    perc_h = " grad SR/HR | grad bicubic | dfeat dist |" if has_perc else ""
    print("| run | split | scale | PSNR SR | PSNR deploy |" + int8_h +
          " PSNR bicubic | SSIM deploy | SSIM bicubic |" + perc_h +
          " beats bicubic |")
    print("|---|---|---|---|---|" + ("---|---|" if has_int8 else "") +
          "---|---|---|" + ("---|---|---|" if has_perc else "") + "---|")
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
            gr = r.get("grad_ratio_deploy_recal")
            dd = r.get("dfeat_dist_deploy_recal")
        else:
            dep = f"{r['psnr_deploy']:.2f}"
            dep_ssim = r["ssim_deploy"]
            gr = r.get("grad_ratio_deploy")
            dd = r.get("dfeat_dist_deploy")
        if has_perc:
            grb = r.get("grad_ratio_bicubic")
            perc_c = (f" {gr:.3f} |" if gr is not None else " — |")
            perc_c += (f" {grb:.3f} |" if grb is not None else " — |")
            perc_c += (f" {dd:.1e} |" if dd is not None else " — |")
        else:
            perc_c = ""
        print(f"| {r['label']} | {r['split']} | x{r['scale']} "
              f"| {r['psnr_sr']:.2f} | {dep} |" + int8_c +
              f" {r['psnr_bicubic']:.2f} | {dep_ssim:.4f} "
              f"| {r['ssim_bicubic']:.4f} |" + perc_c +
              f" {'yes' if r['beats_bicubic'] else 'no'} |")
    if any("psnr_deploy_recal" in r for r in rows):
        print("\n`*` `--recalibrate-bn` fold (the variant beats_bicubic keys on)")
    if has_perc:
        print("\n`grad SR/HR`: edge-energy ratio of the served variant vs "
              "ground truth (1 = HR-sharp; MSE models sit low). "
              "`dfeat dist`: fixed-judge D-feature distance (lower = "
              "perceptually closer).")


if __name__ == "__main__":
    main()
