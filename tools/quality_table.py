"""Aggregate tools/eval_quality.py JSONL lines into a markdown table.

Usage:
  python tools/quality_table.py /tmp/eval_quality.jsonl [--split heldout]
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl")
    ap.add_argument("--split", default=None,
                    help="only rows for this split (default: all)")
    args = ap.parse_args(argv)

    rows = []
    with open(args.jsonl) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    if args.split:
        rows = [r for r in rows if r["split"] == args.split]

    print("| run | split | scale | PSNR SR | PSNR deploy | PSNR bicubic | "
          "SSIM SR | SSIM bicubic | beats bicubic |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['label']} | {r['split']} | x{r['scale']} "
              f"| {r['psnr_sr']:.2f} | {r['psnr_deploy']:.2f} "
              f"| {r['psnr_bicubic']:.2f} | {r['ssim_sr']:.4f} "
              f"| {r['ssim_bicubic']:.4f} "
              f"| {'yes' if r['beats_bicubic'] else 'no'} |")


if __name__ == "__main__":
    main()
