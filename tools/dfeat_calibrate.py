"""Principled dfeat_scale calibration by gradient-norm matching.

The content window's job is to anchor the generator against adversarial
pressure (reference train.py:183-186). The one anchor empirically proven in
this environment is the 10x pixel-identity window (x2_gan_pix held bicubic
parity where the weak-extractor runs collapsed 5 dB). So: pick dfeat_scale
such that the dfeat content term pulls on the fake image as hard as the
known-good anchor does —

    scale* = ||d L_identity@10 / d fake|| / ||d L_dfeat@1 / d fake||

measured at a real checkpoint (default quality_runs/x2_gan/0 — its D is
adversarially trained, so the features are meaningful) on a real batch.
Also reports the adversarial term's gradient norm for context. Runs on CPU
(--cpu) in a few minutes; no training required.

Usage: python tools/dfeat_calibrate.py --cpu [--checkpoint ...] [--taps 1,3,5]
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
    ap.add_argument("--checkpoint", default="quality_runs/x2_gan/0")
    ap.add_argument("--g-checkpoint", default=None,
                    help="load G from a different checkpoint (e.g. the "
                         "healthy MSE-pretrained x2/0) while D comes from "
                         "--checkpoint")
    ap.add_argument("--taps", default="1,3,5")
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--d-features", default=None)
    ap.add_argument("--d-strides", default=None)
    ap.add_argument("--identity-weight", type=float, default=10.0,
                    help="weight of the pixel-identity anchor to match "
                         "(10 = the 3-channel identity window; 1 = the "
                         "1-channel content-window substitution)")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--synthetic-len", type=int, default=2048)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from sisr_tpu import config as C
    from sisr_tpu.checkpoint import load_checkpoint, transplant
    from sisr_tpu.data.pipeline import make_dataset
    from sisr_tpu.models.discriminator import (discriminator_apply,
                                               discriminator_features)
    from sisr_tpu.models.generator import generator_apply
    from sisr_tpu.ops.resize import lr_from_hr
    from sisr_tpu.train.losses import bce_with_logits, content_loss
    from sisr_tpu.train.step import init_train_state

    taps = tuple(int(t) for t in args.taps.split(","))
    kw = {}
    if args.d_features:
        kw["d_features"] = tuple(int(t) for t in args.d_features.split(","))
    if args.d_strides:
        kw["d_strides"] = tuple(int(t) for t in args.d_strides.split(","))
    import dataclasses
    cfg = C.preset_x2_gan(args.dataset, **kw)
    hr_s, lr_s = cfg.geometry()
    cfg = dataclasses.replace(cfg, generator=dataclasses.replace(
        cfg.generator, input_channels=hr_s[0]))  # mnist is 1-channel
    dis_cfg = cfg.discriminator()
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    ckpt = load_checkpoint(args.checkpoint)
    if not ckpt:
        raise SystemExit(f"cannot read {args.checkpoint}")
    gsrc = ckpt
    if args.g_checkpoint:
        gsrc = load_checkpoint(args.g_checkpoint)
        if not gsrc:
            raise SystemExit(f"cannot read {args.g_checkpoint}")
    pg, _ = transplant(ts["params_g"], gsrc["net_g"]["params"])
    sg, _ = transplant(ts["state_g"], gsrc["net_g"]["state"])
    pd, repd = transplant(ts["params_d"], ckpt["net_d"]["params"])
    sd, _ = transplant(ts["state_d"], ckpt["net_d"]["state"])
    print(f"# D transplant coverage {100 * repd.coverage:.1f}%",
          file=sys.stderr)

    ds = make_dataset("synthetic", None, hr_s, args.synthetic_len)
    hr = jnp.asarray(np.stack([ds[i] for i in range(args.batch_size)]))
    lr = lr_from_hr(hr, (lr_s[1], lr_s[2]))
    cd = jnp.bfloat16
    fake, _ = jax.jit(lambda p, s, x: generator_apply(
        p, s, x, train=True, cfg=cfg.generator, compute_dtype=cd))(pg, sg, lr)

    def l_adv(f):
        logit, _ = discriminator_apply(pd, sd, f, train=True, cfg=dis_cfg,
                                       compute_dtype=cd, return_logits=True)
        return 5e-2 * bce_with_logits(logit, 1.0)

    wid = args.identity_weight

    def l_identity(f):  # the known-good pixel anchor
        a = hr.astype(jnp.float32).reshape(hr.shape[0], -1)
        return wid * content_loss(a, f.astype(jnp.float32)
                                  .reshape(f.shape[0], -1))

    def l_dfeat(f):
        ex = lambda x: discriminator_features(  # noqa: E731
            pd, sd, x, cfg=dis_cfg, taps=taps, compute_dtype=cd)
        return content_loss(ex(hr), ex(f))

    out = {"checkpoint": args.checkpoint, "taps": list(taps)}
    norms = {}
    id_key = f"identity@{wid:g}"
    for name, fn in (("adv@5e-2", l_adv), (id_key, l_identity),
                     ("dfeat@1", l_dfeat)):
        val, g = jax.jit(jax.value_and_grad(fn))(fake)
        norms[name] = float(jnp.linalg.norm(g.astype(jnp.float32)))
        out[f"loss_{name}"] = round(float(val), 6)
        out[f"gnorm_{name}"] = float(f"{norms[name]:.3e}")
    out["recommended_dfeat_scale"] = round(
        norms[id_key] / max(norms["dfeat@1"], 1e-30), 2)
    out["dfeat_vs_adv"] = round(
        norms["dfeat@1"] / max(norms["adv@5e-2"], 1e-30), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
