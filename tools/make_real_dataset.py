"""Build a small real-photograph dataset from images bundled with installed
packages (no network egress is available in this environment):

  - sklearn.datasets load_sample_images: china.jpg, flower.jpg (427x640)
  - matplotlib sample_data: grace_hopper.jpg

Tiles each photo into overlapping 128x128 crops (stride 64) plus horizontal
flips and writes them as PNGs in image-folder layout, usable as
`--dataset celeba --data-root <out>` (celeba geometry = 128x128 HR, x4 max —
reference config.py:203-214). Deterministic file order => the held-out test
batch (last `batch_size` files, reference config.py:271-272) is always the
same crops.

Usage:  python tools/make_real_dataset.py --out quality_runs/real_data
"""
from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

CROP = 128
STRIDE = 64


def photos():
    from sklearn.datasets import load_sample_images
    ds = load_sample_images()
    for arr, path in zip(ds.images, ds.filenames):
        yield os.path.splitext(os.path.basename(path))[0], np.asarray(arr, np.uint8)
    import matplotlib
    hopper = os.path.join(matplotlib.get_data_path(), "sample_data",
                          "grace_hopper.jpg")
    if os.path.exists(hopper):
        yield "hopper", np.asarray(Image.open(hopper).convert("RGB"), np.uint8)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--crop", type=int, default=CROP)
    ap.add_argument("--stride", type=int, default=STRIDE)
    args = ap.parse_args(argv)

    out = os.path.join(args.out, "photos")
    os.makedirs(out, exist_ok=True)
    n = 0
    for name, img in photos():
        h, w = img.shape[:2]
        for y in range(0, h - args.crop + 1, args.stride):
            for x in range(0, w - args.crop + 1, args.stride):
                tile = img[y:y + args.crop, x:x + args.crop]
                Image.fromarray(tile).save(
                    os.path.join(out, f"{name}_{y:04d}_{x:04d}.png"))
                Image.fromarray(tile[:, ::-1]).save(
                    os.path.join(out, f"{name}_{y:04d}_{x:04d}_f.png"))
                n += 2
    print(f"wrote {n} crops to {out}")


if __name__ == "__main__":
    main()
