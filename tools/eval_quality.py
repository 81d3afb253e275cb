"""Quality evaluation for a trained checkpoint: SR vs the bicubic-upscale
baseline on (a) the held-out test batch (the last `batch_size` dataset
images, the reference's test split — config.py:271-272) and (b) a batch of
*fresh* synthetic images the training never saw (indices past the training
set's range; the synthetic dataset is deterministic per index).

Reports PSNR/SSIM for the train-mode-BN forward (the reference's eval
convention — visualisation.py never calls .eval()) and for the folded
deploy path (the serving path). Prints one JSON line per split.

Usage:
  python tools/eval_quality.py --checkpoint quality_runs/x2/0 \
      --n-suffixes 0 --synthetic-len 2048
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--n-suffixes", type=int, default=0)
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--synthetic-len", type=int, default=2048,
                    help="training dataset length (held-out batch = its "
                         "last batch_size images)")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--fresh-n", type=int, default=64,
                    help="synthetic only: images at unseen indices")
    ap.add_argument("--fresh-root", default=None,
                    help="file datasets: a directory of never-trained "
                         "images (e.g. make_real_dataset's <out>/fresh) "
                         "evaluated as the 'fresh' split")
    ap.add_argument("--label", default=None)
    ap.add_argument("--dfeat-ckpt", default=None,
                    help="checkpoint whose net_d serves as a FIXED learned "
                         "perceptual judge: adds dfeat_dist_* columns (mean "
                         "squared distance between D-ladder features of SR "
                         "and HR). Use ONE judge across all rows of a table "
                         "so the column is comparable.")
    ap.add_argument("--dfeat-taps", default="1,3,5")
    ap.add_argument("--quant", action="store_true",
                    help="also evaluate the int8 quantized deploy path")
    ap.add_argument("--recalibrate-bn", action="store_true",
                    help="re-estimate BN running stats on the training "
                         "corpus before folding (fixes the deploy gap when "
                         "a short finetune's EMA lags the data "
                         "distribution) — adds deploy_recal columns")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (debug / no-chip fallback)")
    args = ap.parse_args(argv)

    if args.cpu:
        # debugging / chip-less fallback: force the CPU backend (the
        # site hook pins JAX_PLATFORMS=axon, so env vars don't work)
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from sisr_tpu import config as C
    from sisr_tpu.checkpoint import load_checkpoint, transplant
    from sisr_tpu.config import GeneratorConfig
    from sisr_tpu.data.pipeline import SyntheticDataset, make_dataset
    from sisr_tpu.infer import make_deploy_fn, make_sr_fn
    from sisr_tpu.metrics import gmsd, grad_ratio, hf_energy_ratio, psnr, ssim
    from sisr_tpu.models.generator import generator_init
    from sisr_tpu.ops.resize import bicubic_resize, lr_from_hr

    # channel count follows the dataset geometry (mnist is 1-channel)
    scale = GeneratorConfig(n_suffixes=args.n_suffixes).scale
    hr_s, lr_s = C.resolve_geometry(args.dataset, scale)
    gen_cfg = GeneratorConfig(n_suffixes=args.n_suffixes,
                              input_channels=hr_s[0])

    params, state = generator_init(jax.random.PRNGKey(0), gen_cfg)
    ckpt = load_checkpoint(args.checkpoint)
    if not ckpt:
        raise SystemExit(f"cannot read checkpoint {args.checkpoint}")
    params, rep = transplant(params, ckpt["net_g"]["params"])
    state, _ = transplant(state, ckpt["net_g"]["state"])
    if rep.coverage < 1.0:
        print(f"[warn] transplant coverage {100 * rep.coverage:.1f}% — "
              "checkpoint architecture may not match --n-suffixes")

    sr_train_bn = make_sr_fn(gen_cfg, compute_dtype=jnp.bfloat16)
    deploy = make_deploy_fn(params, state, gen_cfg, compute_dtype=jnp.bfloat16)
    deploy_recal = None
    if args.recalibrate_bn:
        from sisr_tpu.infer import recalibrate_bn
        ds = make_dataset(args.dataset, args.data_root, hr_s,
                          args.synthetic_len)
        n_train = max(len(ds) - args.batch_size, args.batch_size)
        idx = np.linspace(0, n_train - 1, min(n_train, 8 * args.batch_size),
                          dtype=int)  # spread over the training split
        cal = []
        for b in range(0, len(idx) - args.batch_size + 1, args.batch_size):
            hr_b = jnp.asarray(np.stack([ds[i]
                                         for i in idx[b:b + args.batch_size]]))
            cal.append(lr_from_hr(hr_b, (lr_s[1], lr_s[2])))
        state_recal = recalibrate_bn(params, state, gen_cfg, cal,
                                     compute_dtype=jnp.bfloat16)
        deploy_recal = make_deploy_fn(params, state_recal, gen_cfg,
                                      compute_dtype=jnp.bfloat16)
    deploy_q = None
    if args.quant:
        from sisr_tpu.quant import make_deploy_fn_int8
        deploy_q = make_deploy_fn_int8(params, state, gen_cfg)

    dfeat_dist = None
    if args.dfeat_ckpt:
        # fixed learned perceptual judge (VERDICT r4 next #4): one trained
        # discriminator's ladder features score every row of a table, so
        # the column is comparable across checkpoints (unlike each row's
        # own D, which co-evolves with its G)
        from sisr_tpu.config import DiscriminatorConfig
        from sisr_tpu.models.discriminator import (discriminator_features,
                                                   discriminator_init)
        taps = tuple(int(t) for t in args.dfeat_taps.split(","))
        d_ck = load_checkpoint(args.dfeat_ckpt)
        if not d_ck or "net_d" not in d_ck:
            raise SystemExit(f"--dfeat-ckpt {args.dfeat_ckpt}: no net_d")
        dis_cfg = DiscriminatorConfig(input_shape=hr_s)
        pd, sd = discriminator_init(jax.random.PRNGKey(1), dis_cfg)
        pd, drep = transplant(pd, d_ck["net_d"]["params"])
        sd, _ = transplant(sd, d_ck["net_d"]["state"])
        if drep.coverage < 1.0:
            print(f"[warn] dfeat judge transplant {100 * drep.coverage:.1f}%")

        @jax.jit
        def dfeat_dist(a, b):  # mean squared D-feature distance
            fa = discriminator_features(pd, sd, a, cfg=dis_cfg, taps=taps)
            fb = discriminator_features(pd, sd, b, cfg=dis_cfg, taps=taps)
            return jnp.mean(jnp.square(fa - fb))

    def batches(name):
        ds = make_dataset(args.dataset, args.data_root, hr_s,
                          args.synthetic_len)
        held = np.stack([ds[i] for i in
                         range(len(ds) - args.batch_size, len(ds))])
        yield "heldout", held
        if args.dataset == "synthetic" and args.fresh_n > 0:
            fresh_ds = SyntheticDataset(hr_s, args.synthetic_len + args.fresh_n)
            fresh = np.stack([fresh_ds[i] for i in
                              range(args.synthetic_len,
                                    args.synthetic_len + args.fresh_n)])
            yield "fresh", fresh
        elif args.fresh_root is not None:
            fds = make_dataset(args.dataset, args.fresh_root, hr_s, None)
            k = min(len(fds), max(args.fresh_n, args.batch_size))
            yield "fresh", np.stack([fds[i] for i in range(k)])

    label = args.label or os.path.basename(os.path.dirname(args.checkpoint))
    for split, hr in batches(args.dataset):
        hr_j = jnp.asarray(hr)
        lr = lr_from_hr(hr_j, (lr_s[1], lr_s[2]))
        bic = bicubic_resize(lr, (hr_s[1], hr_s[2]))
        out = {"label": label, "split": split, "scale": scale,
               "n": int(hr.shape[0])}
        variants = [("sr", sr_train_bn(params, state, lr)),
                    ("deploy", deploy(lr)),
                    ("bicubic", bic)]
        if deploy_recal is not None:
            variants.append(("deploy_recal", deploy_recal(lr)))
        if deploy_q is not None:
            variants.append(("int8", deploy_q(lr)))
        for name, sr in variants:
            out[f"psnr_{name}"] = round(float(psnr(sr, hr_j)), 3)
            out[f"ssim_{name}"] = round(float(ssim(sr, hr_j)), 4)
            # perceptual/sharpness axis (VERDICT r4 next #4): grad_ratio
            # -> 1 and hf_ratio -> 1 are better; gmsd lower is better
            out[f"grad_ratio_{name}"] = round(float(grad_ratio(sr, hr_j)), 4)
            out[f"gmsd_{name}"] = round(float(gmsd(sr, hr_j)), 5)
            out[f"hf_ratio_{name}"] = round(
                float(hf_energy_ratio(sr, hr_j)), 4)
            if dfeat_dist is not None and name != "bicubic":
                out[f"dfeat_dist_{name}"] = round(
                    float(dfeat_dist(sr, hr_j)), 6)
        if dfeat_dist is not None:
            out["dfeat_dist_bicubic"] = round(float(dfeat_dist(bic, hr_j)), 6)
            out["dfeat_judge"] = args.dfeat_ckpt
        # `beats_bicubic` keys on the DEPLOY numbers (the serving path and
        # the path every README table quotes — round-3 VERDICT weak #3:
        # keying on train-mode BN flagged a row whose deploy path lost).
        # The best deployable variant counts: recalibrated-BN deploy when
        # evaluated, else the plain fold. Rows carry `bb_semantics` so
        # cross-round tables can't conflate this definition with the
        # round-3 train-mode one (ADVICE r4); `beats_bicubic_deploy` is the
        # same fact under its unambiguous name.
        best_deploy = out.get("psnr_deploy_recal", out["psnr_deploy"])
        out["beats_bicubic"] = bool(best_deploy > out["psnr_bicubic"])
        out["beats_bicubic_deploy"] = out["beats_bicubic"]
        out["bb_semantics"] = "best_deploy_v2"
        out["beats_bicubic_train"] = bool(out["psnr_sr"] > out["psnr_bicubic"])
        print(json.dumps(out))


if __name__ == "__main__":
    main()
