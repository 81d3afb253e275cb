"""Convert a reference torch checkpoint into a sisr_tpu checkpoint.

Usage:
  python tools/import_torch_checkpoint.py <torch_ckpt> <out_path> \
      [--hr H W] [--features 64 64 128 128 256 256 512 512] \
      [--strides 1 2 1 2 1 2 1 2]

Reads the reference's single-file dict {epoch, net_g, net_d, opti_g,
opti_d, dis_list} (reference utils.py:108-115), maps both networks through
sisr_tpu.interop, and writes a native checkpoint payload loadable by
--checkpoint / restore_train_state. Optimizer states are NOT converted
(torch Adam state uses parameter-id keys; fresh optimizers are the safe
resume — the reference itself falls back the same way, config.py:296-302).
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_ckpt")
    ap.add_argument("out_path")
    ap.add_argument("--hr", type=int, nargs=2, default=[128, 128])
    ap.add_argument("--features", type=int, nargs="+",
                    default=[64, 64, 128, 128, 256, 256, 512, 512])
    ap.add_argument("--strides", type=int, nargs="+",
                    default=[1, 2, 1, 2, 1, 2, 1, 2])
    ap.add_argument("--scale-factor", type=int, default=4)
    args = ap.parse_args(argv)

    import torch
    from sisr_tpu.checkpoint import FORMAT_VERSION, save_checkpoint
    from sisr_tpu.interop import (import_discriminator_state_dict,
                                  import_generator_state_dict)
    from sisr_tpu.nn.pytree import unflatten_from_paths

    ck = torch.load(args.torch_ckpt, map_location="cpu")
    g = import_generator_state_dict(
        {k: v.numpy() for k, v in ck["net_g"].items()})
    d = import_discriminator_state_dict(
        {k: v.numpy() for k, v in ck["net_d"].items()},
        tuple(args.hr), args.features, args.strides)

    dis_list = ck.get("dis_list")
    if dis_list:
        # list of NCHW torch tensors -> one NHWC stack
        dis_list = np.stack([np.asarray(t).transpose(0, 2, 3, 1)
                             for t in dis_list])

    payload = {
        "format_version": FORMAT_VERSION,
        "epoch": int(ck.get("epoch", 0)),
        "scale_factor": args.scale_factor,
        "net_g": {"params": unflatten_from_paths(g["params"]),
                  "state": unflatten_from_paths(g["state"])},
        "net_d": {"params": unflatten_from_paths(d["params"]),
                  "state": unflatten_from_paths(d["state"])},
        "dis_list": dis_list,
    }
    path = save_checkpoint(".", payload, path=args.out_path)
    print("wrote", path)


if __name__ == "__main__":
    main()
