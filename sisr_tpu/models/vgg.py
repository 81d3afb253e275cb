"""MaskedVGG content-feature extractor, TPU-native.

Parity with reference model_content_extractor.py:33-73: a 5-bit mask selects
which of VGG19's *pre-activation, pre-maxpool* feature maps to keep; the
network is truncated at the last kept tap; forward returns the concatenation
of the flattened kept maps, shape (B, -1). Images are fed in [-1, 1] with no
ImageNet renormalization — exactly as the reference does (it feeds
Normalize(.5,.5,.5) output straight into torchvision VGG19).

Pretrained weights: the runtime loads a .npz produced by
tools/port_vgg_weights.py from a torchvision checkpoint. With no weight file
available (this build environment has no network egress), `vgg_init` falls
back to a fixed-seed random init — a valid fixed feature extractor for the
perceptual loss (random VGG features are a known-usable perceptual metric),
clearly reported so benchmark PSNR comparisons stay honest.

VGG19 `features` ladder (torchvision indexing, 0-based):
conv taps before each maxpool sit at indices 2, 7, 16, 25, 34
(reference maxPool_indexes=(4,9,18,27,36), before-act = idx-2 in 0-based
conv terms; model_content_extractor.py:6-7).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sisr_tpu.nn.layers import conv2d_apply, conv2d_init

# torchvision vgg19 'E' configuration
_VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M")

#: per-stage (channels, spatial divisor) for the 5 taps
#: (reference layersSize, model_content_extractor.py:10)
TAP_CHANNELS = (64, 128, 256, 512, 512)


def _layer_plan():
    """List of ('conv', cin, cout) / ('relu',) / ('pool',) in features order,
    plus the 0-based indices of the pre-pool conv taps."""
    plan, taps = [], []
    cin = 3
    for v in _VGG19_CFG:
        if v == "M":
            taps.append(len(plan) - 2)  # the conv right before [relu, pool]
            plan.append(("pool",))
        else:
            plan.append(("conv", cin, int(v)))
            plan.append(("relu",))
            cin = int(v)
    return plan, taps


_PLAN, _TAPS = _layer_plan()
assert _TAPS == [2, 7, 16, 25, 34], _TAPS


@dataclasses.dataclass(frozen=True)
class VGGConfig:
    mask: int = 0b01111  # reference config.py:104

    def kept_taps(self) -> Tuple[int, ...]:
        return tuple(_TAPS[i] for i in range(5) if self.mask & (1 << i))

    def truncate_at(self) -> int:
        """Last layer index (inclusive) that must run."""
        return self.kept_taps()[-1]

    def n_convs(self) -> int:
        return sum(1 for i, op in enumerate(_PLAN)
                   if i <= self.truncate_at() and op[0] == "conv")


def vgg_init(key_or_npz, cfg: VGGConfig):
    """Params: {'convs': [conv_params...]} for layers up to truncation.

    `key_or_npz` is either a PRNG key (fixed random extractor) or a path to
    an .npz from tools/port_vgg_weights.py (real pretrained features).
    """
    if isinstance(key_or_npz, str):
        data = np.load(key_or_npz)
        convs = []
        i = 0
        for li, op in enumerate(_PLAN):
            if li > cfg.truncate_at():
                break
            if op[0] == "conv":
                convs.append({"kernel": jnp.asarray(data[f"conv{i}_kernel"]),
                              "bias": jnp.asarray(data[f"conv{i}_bias"])})
                i += 1
        return {"convs": convs}
    key = key_or_npz
    convs = []
    for li, op in enumerate(_PLAN):
        if li > cfg.truncate_at():
            break
        if op[0] == "conv":
            key, k = jax.random.split(key)
            convs.append(conv2d_init(k, 3, 3, op[1], op[2]))
    return {"convs": convs}


def vgg_apply(params, x, cfg: VGGConfig, *, compute_dtype=None, flatten: bool = True):
    """Masked multi-tap forward; returns (B, -1) concat (reference
    model_content_extractor.py:51-60) or the list of tap maps."""
    kept = set(cfg.kept_taps())
    saved = []
    ci = 0
    for li, op in enumerate(_PLAN):
        if li > cfg.truncate_at():
            break
        if op[0] == "conv":
            x = conv2d_apply(params["convs"][ci], x, compute_dtype=compute_dtype)
            ci += 1
            if li in kept:
                saved.append(x)
        elif op[0] == "relu":
            x = jnp.maximum(x, 0)
        else:  # 2x2/2 max pool, floor mode (torch default truncates odd dims)
            x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
    if not flatten:
        return saved
    b = saved[0].shape[0]
    return jnp.concatenate([s.astype(jnp.float32).reshape(b, -1) for s in saved], axis=1)


def identity_extract(x):
    """Plain pixel features => MSE content loss (reference
    model_content_extractor.py:12-14 `identity`)."""
    return jnp.asarray(x, jnp.float32).reshape(x.shape[0], -1)


#: The reference's unused alternative extractor `vgg_4conv_1maxPool`
#: (model_content_extractor.py:16-31): the feature map before the second
#: maxpool == the single pre-pool-2 tap.
VGG_4CONV_1MAXPOOL = VGGConfig(mask=0b00010)


def vgg_feature_size(hw: Tuple[int, int], mask: int) -> int:
    """Analytic output width (reference get_size,
    model_content_extractor.py:63-73)."""
    h, w = hw
    size = 0
    for i in range(5):
        if mask & (1 << i):
            size += (h // 2 ** i) * (w // 2 ** i) * TAP_CHANNELS[i]
    return size
