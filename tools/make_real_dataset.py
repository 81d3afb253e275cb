"""Build a small real-photograph dataset from images bundled with installed
packages (no network egress is available in this environment):

  - sklearn.datasets load_sample_images: china.jpg, flower.jpg (427x640)
  - matplotlib sample_data: grace_hopper.jpg (512x600)
  - pygame docs: camera_rgb.jpg (320x240 webcam shot; the camera_average/
    hsv/thresholded siblings are processed copies of the same scene and are
    deliberately excluded)

Round-3 growth (VERDICT r2 next #7 — "grow the real-photo corpus ... at 4x
crops"): each photo is tiled at a **multi-scale pyramid** (1.0 / 0.75 /
0.5, antialiased area downsample — the DIV2K-style multi-scale trick that
adds genuinely new pixel statistics rather than just overlap) with a denser
stride (40 vs the round-2 64), plus horizontal flips. Defaults produce
~1.2k crops vs round 2's 292. Dihedral augmentation stays a *training*
flag (--augment-dihedral) so the baked corpus and the train-time transform
never double-apply.

Tiles are written as PNGs in image-folder layout, usable as
`--dataset celeba --data-root <out>` (celeba geometry = 128x128 HR, x4 max
— reference config.py:203-214). Deterministic file order => the held-out
test batch (last `batch_size` files, reference config.py:271-272) is always
the same crops.

A whole source photo can be held out as a *fresh* split
(--fresh-sources camera, the default): its crops go to <out>/fresh/photos
instead of <out>/photos, giving file datasets a genuinely-unseen second
eval split (cross-image generalization) alongside the held-out-last-batch
split — the synthetic evals' heldout/fresh pair, mirrored for real data.

Usage:  python tools/make_real_dataset.py --out quality_runs/real_data_v2
        python tools/make_real_dataset.py --out ... --stride 64 \
            --scales 1.0 --fresh-sources ''   # the round-2 292-crop corpus
"""
from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

CROP = 128
STRIDE = 40
SCALES = (1.0, 0.75, 0.5)


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
    try:
        import pygame
        cam = os.path.join(os.path.dirname(pygame.__file__), "docs",
                           "generated", "_images", "camera_rgb.jpg")
        if os.path.exists(cam):
            yield "camera", np.asarray(Image.open(cam).convert("RGB"), np.uint8)
    except ImportError:
        pass


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--crop", type=int, default=CROP)
    ap.add_argument("--stride", type=int, default=STRIDE)
    ap.add_argument("--scales", type=float, nargs="+", default=list(SCALES))
    ap.add_argument("--fresh-sources", default="camera",
                    help="comma-separated source names whose crops form the "
                         "fresh (never-trained) split under <out>/fresh/")
    args = ap.parse_args(argv)

    fresh_names = {s for s in args.fresh_sources.split(",") if s}
    out = os.path.join(args.out, "photos")
    fresh_out = os.path.join(args.out, "fresh", "photos")
    os.makedirs(out, exist_ok=True)
    if fresh_names:
        os.makedirs(fresh_out, exist_ok=True)
    n = n_fresh = 0
    for name, img0 in photos():
        dest = fresh_out if name in fresh_names else out
        for scale in args.scales:
            if scale == 1.0:
                img, tag = img0, name
            else:
                h0, w0 = img0.shape[:2]
                h, w = int(h0 * scale), int(w0 * scale)
                if h < args.crop or w < args.crop:
                    continue
                # antialiased area resample: new pixel statistics, not a
                # translated copy of an existing crop
                img = np.asarray(
                    Image.fromarray(img0).resize((w, h), Image.LANCZOS),
                    np.uint8)
                tag = f"{name}_s{int(scale * 100):03d}"
            h, w = img.shape[:2]
            for y in range(0, h - args.crop + 1, args.stride):
                for x in range(0, w - args.crop + 1, args.stride):
                    tile = img[y:y + args.crop, x:x + args.crop]
                    Image.fromarray(tile).save(
                        os.path.join(dest, f"{tag}_{y:04d}_{x:04d}.png"))
                    Image.fromarray(tile[:, ::-1]).save(
                        os.path.join(dest, f"{tag}_{y:04d}_{x:04d}_f.png"))
                    if dest is fresh_out:
                        n_fresh += 2
                    else:
                        n += 2
    print(f"wrote {n} crops to {out}" +
          (f" + {n_fresh} fresh crops to {fresh_out}" if n_fresh else ""))


if __name__ == "__main__":
    main()
