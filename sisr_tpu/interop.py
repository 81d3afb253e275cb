"""Torch-checkpoint interop: import reference state_dicts into sisr_tpu.

Maps the reference's torch module names (model_generator.py /
model_discriminator.py) into this framework's path-flat namespace so a user
of the reference can load their trained checkpoints here directly:

  generator:  first_layers.0.*        -> first_layers/conv/*
              first_layers.1.weight   -> first_layers/prelu/alpha
              block_list.N.layers.{0,1,2,3,4} -> blocks/N/{conv1,bn1,prelu,conv2,bn2}
              block_list_end.{0,1}    -> block_end/{conv,bn}
              upscale.N.{0,2}         -> upscale/N/{conv,prelu}
              end.0                   -> end/conv
              (GeneratorSuffix nesting 'base.' maps to 'base/';
               suffix 'upscale.{0,2}' likewise)
  spectral norm: weight_orig -> kernel (state dict), weight_u/weight_v ->
              state u/v — usable directly because our (u, v) match torch's
              (out, in*kh*kw) matrix view (nn/spectral_norm.py _as_mat).
  batchnorm:  weight/bias -> params scale/bias; running_mean/var -> state.
  conv:       OIHW -> HWIO transpose.
  discriminator: conv.0.* -> stem/conv; conv.2.N.layers.{0,1} ->
              blocks/N/{conv,bn}; fc.0 -> fc1, fc.2 -> fc2 — with the
              fc1 input permutation from torch's (C,H,W) flatten order to
              our NHWC (H,W,C) order.

All functions take/return plain dicts of numpy arrays (no torch needed at
runtime; tools/import_torch_checkpoint.py does the torch.load).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv_entries(dst: Dict, prefix_out: str, sd: Dict, prefix_in: str):
    """Conv with optional spectral-norm key renames."""
    if prefix_in + ".weight_orig" in sd:
        dst["params"][prefix_out + "/kernel"] = np.transpose(
            np.asarray(sd[prefix_in + ".weight_orig"]), (2, 3, 1, 0))
        dst["state"][prefix_out + "/u"] = np.asarray(sd[prefix_in + ".weight_u"])
        dst["state"][prefix_out + "/v"] = np.asarray(sd[prefix_in + ".weight_v"])
    elif prefix_in + ".weight" in sd:
        dst["params"][prefix_out + "/kernel"] = np.transpose(
            np.asarray(sd[prefix_in + ".weight"]), (2, 3, 1, 0))
    else:
        return False
    dst["params"][prefix_out + "/bias"] = np.asarray(sd[prefix_in + ".bias"])
    return True


def _bn_entries(dst: Dict, prefix_out: str, sd: Dict, prefix_in: str):
    dst["params"][prefix_out + "/scale"] = np.asarray(sd[prefix_in + ".weight"])
    dst["params"][prefix_out + "/bias"] = np.asarray(sd[prefix_in + ".bias"])
    dst["state"][prefix_out + "/mean"] = np.asarray(
        sd[prefix_in + ".running_mean"])
    dst["state"][prefix_out + "/var"] = np.asarray(
        sd[prefix_in + ".running_var"])


def _prelu_entry(dst: Dict, prefix_out: str, sd: Dict, key_in: str):
    dst["params"][prefix_out + "/alpha"] = np.asarray(sd[key_in]).reshape(())


def import_generator_state_dict(sd: Dict) -> Dict:
    """Reference Generator/GeneratorSuffix state_dict -> {'params': flat,
    'state': flat} in our namespace. Handles arbitrary 'base.' nesting."""
    sd = {k: v for k, v in sd.items()}
    out = {"params": {}, "state": {}}

    def level_prefixes(depth: int) -> Tuple[str, str]:
        return "base." * depth, "base/" * depth

    max_depth = 0
    for k in sd:
        d = 0
        while k.startswith("base." * (d + 1)):
            d += 1
        max_depth = max(max_depth, d)

    for depth in range(max_depth + 1):
        tin, tout = level_prefixes(depth)
        _conv_entries(out, tout + "first_layers/conv", sd, tin + "first_layers.0")
        if tin + "first_layers.1.weight" in sd:
            _prelu_entry(out, tout + "first_layers/prelu", sd,
                         tin + "first_layers.1.weight")
        n = 0
        while tin + f"block_list.{n}.layers.0.weight" in sd or \
                tin + f"block_list.{n}.layers.0.weight_orig" in sd:
            bp = tout + f"blocks/{n}"
            _conv_entries(out, bp + "/conv1", sd, tin + f"block_list.{n}.layers.0")
            _bn_entries(out, bp + "/bn1", sd, tin + f"block_list.{n}.layers.1")
            _prelu_entry(out, bp + "/prelu", sd,
                         tin + f"block_list.{n}.layers.2.weight")
            _conv_entries(out, bp + "/conv2", sd, tin + f"block_list.{n}.layers.3")
            _bn_entries(out, bp + "/bn2", sd, tin + f"block_list.{n}.layers.4")
            n += 1
        if tin + "block_list_end.0.weight" in sd or \
                tin + "block_list_end.0.weight_orig" in sd:
            _conv_entries(out, tout + "block_end/conv", sd, tin + "block_list_end.0")
            _bn_entries(out, tout + "block_end/bn", sd, tin + "block_list_end.1")
        # base-level upscale stages: upscale.N.{0,2}; suffix-level: upscale.{0,2}
        m = 0
        while _conv_entries(out, tout + f"upscale/{m}/conv", sd,
                            tin + f"upscale.{m}.0"):
            _prelu_entry(out, tout + f"upscale/{m}/prelu", sd,
                         tin + f"upscale.{m}.2.weight")
            m += 1
        if m == 0 and (tin + "upscale.0.weight" in sd or
                       tin + "upscale.0.weight_orig" in sd):
            # GeneratorSuffix flat upscale (model_generator.py:121-126)
            _conv_entries(out, tout + "upscale/conv", sd, tin + "upscale.0")
            _prelu_entry(out, tout + "upscale/prelu", sd, tin + "upscale.2.weight")
        if tin + "end.0.weight" in sd or tin + "end.0.weight_orig" in sd:
            _conv_entries(out, tout + "end/conv", sd, tin + "end.0")
    return out


def import_discriminator_state_dict(sd: Dict, input_hw: Tuple[int, int],
                                    list_n_features, list_stride) -> Dict:
    """Reference Discriminator state_dict -> {'params', 'state'} flat maps.

    `input_hw` and the feature/stride ladder are needed to compute the fc1
    permutation from torch's (C,H,W) flatten order to NHWC (H,W,C)."""
    out = {"params": {}, "state": {}}
    _conv_entries(out, "stem/conv", sd, "conv.0")
    n = 0
    while f"conv.2.{n}.layers.0.weight" in sd or \
            f"conv.2.{n}.layers.0.weight_orig" in sd:
        _conv_entries(out, f"blocks/{n}/conv", sd, f"conv.2.{n}.layers.0")
        _bn_entries(out, f"blocks/{n}/bn", sd, f"conv.2.{n}.layers.1")
        n += 1

    # final feature-map geometry
    h, w = input_hw
    for s in list_stride:
        if s == 2:
            h, w = (h + 1) // 2, (w + 1) // 2
    c = list_n_features[-1]
    fc_in = h * w * c

    w1 = np.asarray(sd["fc.0.weight"])  # (fc_mid, fc_in) in (C,H,W) order
    perm = np.arange(fc_in).reshape(c, h, w).transpose(1, 2, 0).reshape(-1)
    out["params"]["fc1/kernel"] = w1[:, perm].T  # -> (fc_in_hwc, fc_mid)
    out["params"]["fc1/bias"] = np.asarray(sd["fc.0.bias"])
    out["params"]["fc2/kernel"] = np.asarray(sd["fc.2.weight"]).T
    out["params"]["fc2/bias"] = np.asarray(sd["fc.2.bias"])
    return out
