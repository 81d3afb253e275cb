"""Soak: run all five canonical workloads (BASELINE.json configs) end to end
on synthetic data at reduced size, chained through the progressive flow.

  1. x2 MSE-only pretrain + inference
  2. x2 full adversarial (G + D + MaskedVGG)
  3. x4 with adversarial-weight ramp
  4. progressive x2 -> x4 transplant + frozen finetune (uses run 1's ckpt)
  5. x8 supervised AND unsupervised

Usage: python tools/run_all_configs.py [--epochs 1] [--n-batch 4] [--out DIR]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import tempfile


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--n-batch", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--out", default=None)
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--tiny", action="store_true",
                    help="small generator + tiny geometry (fast CPU soak)")
    args = ap.parse_args(argv)
    out = args.out or tempfile.mkdtemp(prefix="sisr_configs_")

    from sisr_tpu import config as C
    from sisr_tpu.checkpoint import load_checkpoint
    from sisr_tpu.train.loop import train

    common = dict(num_epochs=args.epochs, n_batch=args.n_batch,
                  batch_size=args.batch_size, write_root=out + "/", seed=1)
    if args.tiny:
        args.dataset = "tiny"
        common["compute_dtype"] = "float32"
    results = {}

    def shrink(cfg):
        if not args.tiny:
            return cfg
        gen = dataclasses.replace(cfg.generator, n_blocks=2,
                                  n_features_block=8, n_features_last=16)
        return dataclasses.replace(cfg, generator=gen)

    def run(name, cfg, checkpoint=None, save=False):
        cfg = shrink(cfg)
        print(f"\n===== {name} (scale x{cfg.scale_factor}) =====", flush=True)
        r = train(cfg, checkpoint=checkpoint, save=save,
                  synthetic_len=64, verbose=True)
        results[name] = {"psnr": r.metrics["psnr"], "ssim": r.metrics["ssim"],
                         "ckpt": r.write_path}
        return r

    r1 = run("1_x2_mse", C.preset_x2_mse(args.dataset, **common), save=True)
    run("2_x2_gan", C.preset_x2_gan(args.dataset, **common))
    run("3_x4_ramp", C.preset_x4_ramp(args.dataset, ramp_epoch=1, **common)
        if args.epochs > 1 else
        C.preset_x4_ramp(args.dataset, ramp_epoch=0, **common))

    ck = load_checkpoint(r1.write_path)
    cfg4 = C.preset_progressive_x2_to_x4(args.dataset, **common)
    cfg4 = dataclasses.replace(cfg4, progressive_suffix=1, freeze_prefix=True)
    run("4_progressive_x2_x4", cfg4, checkpoint=ck)

    run("5a_x8_supervised", C.preset_x8(args.dataset, unsupervised=False, **common))
    run("5b_x8_unsupervised", C.preset_x8(args.dataset, unsupervised=True, **common))

    print("\n" + json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
