"""Inference/eval CLI — the non-interactive replacement for
`python3 visualisation.py` (reference visualisation.py:16-77).

Per image: LR = lr_from_hr(HR), SR = G(LR), UR = G(HR); prints range
violations like the reference (:49-51), renders the 4-column nearest/
bicubic comparison figure, and — beyond the reference — reports PSNR/SSIM
(vs bicubic upscaling as the baseline) and supports tiled SR of large
images.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

import jax.numpy as jnp

from sisr_tpu import config as C
from sisr_tpu.checkpoint import load_checkpoint, transplant
from sisr_tpu.config import GeneratorConfig
from sisr_tpu.data.pipeline import make_dataset
from sisr_tpu.infer import make_sr_fn, tiled_sr
from sisr_tpu.metrics import psnr, ssim
from sisr_tpu.models.generator import generator_init
from sisr_tpu.ops.resize import bicubic_resize, lr_from_hr
from sisr_tpu.viz import save_comparison_figure


def main(argv=None):
    ap = argparse.ArgumentParser(description="sisr_tpu inference/eval")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (debug / no-chip fallback)")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--n-images", type=int, default=4)
    ap.add_argument("--n-suffixes", type=int, default=1,
                    help="generator growth stages (x4 default, like the "
                         "reference's visualisation.py:17-19)")
    ap.add_argument("--out-dir", default="./eval_out/")
    ap.add_argument("--tiled", action="store_true",
                    help="halo-tiled SR (for large inputs)")
    ap.add_argument("--no-usr", action="store_true")
    ap.add_argument("--deploy", action="store_true",
                    help="deploy mode: fold BN/SN constants into conv "
                         "weights (eval inference, fastest path)")
    ap.add_argument("--recalibrate-bn", action="store_true",
                    help="with --deploy/--quant: re-estimate BN running "
                         "stats on the eval dataset before folding "
                         "(infer.recalibrate_bn) — fixes the deploy gap "
                         "when a short finetune's stats EMA lags the "
                         "serving distribution")
    ap.add_argument("--quant", action="store_true",
                    help="int8 quantized deploy path (implies --deploy "
                         "folding; quality delta vs fp32 is checkpoint-"
                         "specific — see tools/eval_quality.py --quant). "
                         "With --tiled the result is approximate: "
                         "activation scales are dynamic per tile batch, "
                         "so overlapping tiles can quantize differently "
                         "and show faint seams vs full-image int8")
    args = ap.parse_args(argv)
    if args.quant and args.tiled:
        # conv2d_q's per-tensor activation scale is computed per tile
        # batch, which breaks tiled_sr's exactness contract (identical
        # pixels can quantize differently in adjacent tiles). Full-image
        # --quant, or --tiled --deploy (fp32/bf16), are the exact paths.
        print("WARNING: --quant + --tiled is approximate (per-tile dynamic "
              "activation scales; possible tile seams). Use --quant alone "
              "or --tiled --deploy for exact output.")

    if args.cpu:
        # debugging / chip-less fallback: force the CPU backend (the
        # site hook pins JAX_PLATFORMS=axon, so env vars don't work)
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    gen_cfg = GeneratorConfig(n_suffixes=args.n_suffixes)
    scale = gen_cfg.scale
    hr_s, lr_s = C.resolve_geometry(args.dataset, scale)

    params, state = generator_init(jax.random.PRNGKey(0), gen_cfg)
    ckpt = load_checkpoint(args.checkpoint)
    if not ckpt:
        raise SystemExit(f"cannot read checkpoint {args.checkpoint}")
    params, rep = transplant(params, ckpt["net_g"]["params"])
    state, _ = transplant(state, ckpt["net_g"]["state"])
    print(rep)

    ds = make_dataset(args.dataset, args.data_root, hr_s)
    os.makedirs(args.out_dir, exist_ok=True)
    if args.recalibrate_bn and (args.deploy or args.quant):
        from sisr_tpu.infer import recalibrate_bn
        # Calibrate on images EXCLUDED from scoring: the scored set is
        # ds[0:n_images], so calibration draws from ds[n_images:] only
        # (calibrating on the eval images would be test-time adaptation on
        # the test set — ADVICE r4). If the dataset has no spare images,
        # warn and skip rather than silently biasing the metrics.
        cal_lo = min(args.n_images, len(ds))
        n_cal = min(len(ds) - cal_lo, 64)
        cal = []
        for b in range(cal_lo, cal_lo + n_cal - 7, 8):
            hr_b = jnp.asarray(np.stack([ds[i] for i in range(b, b + 8)]))
            cal.append(lr_from_hr(hr_b, (hr_b.shape[1] // scale,
                                         hr_b.shape[2] // scale)))
        if cal:
            state = recalibrate_bn(params, state, gen_cfg, cal,
                                   compute_dtype=jnp.bfloat16)
            print(f"[recalibrate-bn] running stats re-estimated on "
                  f"{len(cal)} batches (images {cal_lo}..{cal_lo + n_cal - 1},"
                  " disjoint from the scored set)")
        else:
            print("WARNING: --recalibrate-bn skipped — no dataset images "
                  f"beyond the {cal_lo} scored ones to calibrate on "
                  "(need >=8 spare; lower --n-images or grow the dataset)")
    if args.quant:
        from sisr_tpu.quant import make_deploy_fn_int8
        deploy = make_deploy_fn_int8(params, state, gen_cfg)
        fwd = lambda p, s, x: deploy(x)  # noqa: E731
    elif args.deploy:
        from sisr_tpu.infer import make_deploy_fn
        deploy = make_deploy_fn(params, state, gen_cfg,
                                compute_dtype=jnp.bfloat16)
        fwd = lambda p, s, x: deploy(x)  # noqa: E731
    else:
        fwd = make_sr_fn(gen_cfg, compute_dtype=jnp.bfloat16)

    psnrs, ssims, psnrs_bicubic = [], [], []
    for i in range(min(args.n_images, len(ds))):
        hr = ds[i][None]  # (1, H, W, C)
        lr = np.asarray(lr_from_hr(jnp.asarray(hr), (lr_s[1], lr_s[2])))
        if args.tiled:
            # lr is always (1, h, w, C) here; deploy mode composes by
            # overriding the per-tile forward with the folded fn
            sr = tiled_sr(params, state, lr, gen_cfg,
                          compute_dtype=jnp.bfloat16,
                          fwd=fwd if (args.deploy or args.quant) else None)
        else:
            sr = np.asarray(fwd(params, state, jnp.asarray(lr)))
        rows = [("LR", lr[0]), ("SR", sr[0]), ("HR", hr[0])]
        if not args.no_usr:
            ur = np.asarray(fwd(params, state, jnp.asarray(hr)))
            rows.append(("UR", ur[0]))
            if ur.min() < -1.0 or ur.max() > 1.0:
                print(f"image {i}: UR range violation "
                      f"[{ur.min():.3f}, {ur.max():.3f}]")
        # range check like reference visualisation.py:49-51
        if sr.min() < -1.0 or sr.max() > 1.0:
            print(f"image {i}: SR range violation "
                  f"[{sr.min():.3f}, {sr.max():.3f}]")
        save_comparison_figure(rows, os.path.join(args.out_dir, f"img{i}"))

        bic = np.asarray(bicubic_resize(jnp.asarray(lr), (hr_s[1], hr_s[2])))
        psnrs.append(float(psnr(jnp.asarray(sr), jnp.asarray(hr))))
        ssims.append(float(ssim(jnp.asarray(sr), jnp.asarray(hr))))
        psnrs_bicubic.append(float(psnr(jnp.asarray(bic), jnp.asarray(hr))))

    print(f"SR  PSNR {np.mean(psnrs):.2f} dB   SSIM {np.mean(ssims):.4f}")
    print(f"bicubic-upscale PSNR {np.mean(psnrs_bicubic):.2f} dB (baseline)")
    print("figures in", args.out_dir)
    return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
            "psnr_bicubic": float(np.mean(psnrs_bicubic))}


def cli(argv=None) -> int:
    """Console-script entry point (see cli/train.py:cli)."""
    main(argv)
    return 0


if __name__ == "__main__":
    main()
