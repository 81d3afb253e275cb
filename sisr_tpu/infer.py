"""Inference: jitted SR at fixed sizes + overlapping-patch tiled SR for
arbitrarily large images.

The reference's generator is fully convolutional and is applied to any
input size directly (UR = G(HR), reference visualisation.py:53), bounded
only by memory — the report notes 1024^2 is >=64x costlier, which is why
large images were never used (SURVEY.md §5 'long-context'). The TPU-native
answer is halo tiling (BASELINE.json north star): decompose the input into
fixed-size tiles with overlap, batch the tiles through one compiled
generator call, and blend the overlapping output borders with linear
feathering. Fixed tile shapes mean ONE compilation for any image size, and
the tile batch keeps the MXU full.

The halo must cover the generator's receptive-field bleed: each 3x3 conv
adds 1px, the 9x9 stem adds 4px; 16 blocks x 2 convs + stem + trunk-end +
upscale convs => ~40px at LR scale for the default net. `halo=48` gives
slack; correctness vs direct full-image inference is asserted in tests at
loose tolerance and visually indistinguishable.
"""
from __future__ import annotations


import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sisr_tpu.config import GeneratorConfig
from sisr_tpu.models.generator import generator_apply


def fold_generator(params, state, gen_cfg: GeneratorConfig):
    """Deploy-mode constant folding for eval inference.

    In eval mode both normalizations are affine constants, so they fold
    into the conv weights:
    - spectral norm: W' = W / sigma(u, v)           (stored vectors)
    - BatchNorm:     W'' = W' * gamma/sqrt(var+eps) (per out-channel),
                     b'' = (b - mean) * gamma/sqrt(var+eps) + beta
    Returns (folded_params, folded_state) with BN set to exact identity and
    SN state removed — the same generator_apply runs them with zero
    normalization work. Only valid for eval (running-stats) inference.
    """
    import numpy as np
    from sisr_tpu.nn.spectral_norm import sn_normalize

    eps = 1e-5

    def fold_conv(conv_p, conv_s):
        if conv_s:  # spectral norm
            kernel, _ = sn_normalize(conv_p["kernel"], conv_s, train=False)
        else:
            kernel = conv_p["kernel"]
        return {"kernel": kernel, "bias": conv_p["bias"]}, {}

    def fold_conv_bn(conv_p, conv_s, bn_p, bn_s):
        p, _ = fold_conv(conv_p, conv_s)
        scale = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
        kernel = p["kernel"] * scale[None, None, None, :]
        bias = (p["bias"] - bn_s["mean"]) * scale + bn_p["bias"]
        ident_p = {"scale": jnp.ones_like(bn_p["scale"]),
                   "bias": jnp.zeros_like(bn_p["bias"])}
        ident_s = {"mean": jnp.zeros_like(bn_s["mean"]),
                   "var": jnp.full_like(bn_s["var"], 1.0 - eps)}
        return {"kernel": kernel, "bias": bias}, {}, ident_p, ident_s

    def fold_level(p, s):
        if "base" in p:
            bp, bs = fold_level(p["base"], s["base"])
            up, us = fold_conv(p["upscale"]["conv"], s["upscale"]["conv"])
            return ({"base": bp, "upscale": {"conv": up,
                                             "prelu": p["upscale"]["prelu"]}},
                    {"base": bs, "upscale": {"conv": us}})
        np_, ns_ = {}, {}
        cp, cs = fold_conv(p["first_layers"]["conv"], s["first_layers"]["conv"])
        np_["first_layers"] = {"conv": cp, "prelu": p["first_layers"]["prelu"]}
        ns_["first_layers"] = {"conv": cs}
        np_["blocks"], ns_["blocks"] = [], []
        for bp, bs in zip(p["blocks"], s["blocks"]):
            c1, s1, ip1, is1 = fold_conv_bn(bp["conv1"], bs["conv1"],
                                            bp["bn1"], bs["bn1"])
            c2, s2, ip2, is2 = fold_conv_bn(bp["conv2"], bs["conv2"],
                                            bp["bn2"], bs["bn2"])
            np_["blocks"].append({"conv1": c1, "bn1": ip1, "prelu": bp["prelu"],
                                  "conv2": c2, "bn2": ip2})
            ns_["blocks"].append({"conv1": s1, "bn1": is1,
                                  "conv2": s2, "bn2": is2})
        ce, se, ipe, ise = fold_conv_bn(p["block_end"]["conv"],
                                        s["block_end"]["conv"],
                                        p["block_end"]["bn"],
                                        s["block_end"]["bn"])
        np_["block_end"] = {"conv": ce, "bn": ipe}
        ns_["block_end"] = {"conv": se, "bn": ise}
        np_["upscale"], ns_["upscale"] = [], []
        for up, us in zip(p["upscale"], s["upscale"]):
            cu, su = fold_conv(up["conv"], us["conv"])
            np_["upscale"].append({"conv": cu, "prelu": up["prelu"]})
            ns_["upscale"].append({"conv": su})
        cend, send = fold_conv(p["end"]["conv"], s["end"]["conv"])
        np_["end"] = {"conv": cend}
        ns_["end"] = {"conv": send}
        return np_, ns_

    return fold_level(params, state)


def recalibrate_bn(params, state, gen_cfg: GeneratorConfig, lr_batches, *,
                   passes: int = 6, compute_dtype=None):
    """Re-estimate BN running stats on a calibration corpus.

    The checkpointed running stats are an EMA over the *training*
    distribution; when a model is finetuned briefly on data far from its
    pretraining distribution (e.g. real photos after synthetic pretraining)
    the stats lag the new distribution and the folded deploy path
    (`fold_generator`, which bakes them into the conv weights) can lose
    >2 dB vs the train-mode-BN forward (measured: round-3 `real_x2_v2`
    fresh split, 27.75 vs 29.95 dB). Standard deploy fix: run train-mode
    forwards over the finetune corpus so the EMA (momentum 0.1, reference
    model_generator.py:11,14) converges to the serving distribution, then
    fold. Only the BN running stats are taken from the recalibration pass —
    SN power-iteration vectors and everything else keep their checkpointed
    values (recalibration must not perturb the effective weights).

    `lr_batches`: iterable of LR input batches (consumed `passes` times, so
    pass a list/tuple, not a generator). After `passes*len(lr_batches)`
    steps the initial stats carry weight 0.9^N (~0.8% at N=48).
    """
    fwd = jax.jit(lambda p, s, x: generator_apply(
        p, s, x, train=True, cfg=gen_cfg, compute_dtype=compute_dtype)[1])
    new_state = state
    for _ in range(passes):
        for x in lr_batches:
            new_state = fwd(params, new_state, jnp.asarray(x))

    def merge(old, new):
        if isinstance(old, dict):
            return {k: (new[k] if k.startswith("bn") else
                        merge(old[k], new[k])) for k in old}
        if isinstance(old, (list, tuple)):
            # preserve the container type: rebuilding tuples as lists would
            # silently change the state pytree structure (ADVICE r4)
            return type(old)(merge(o, n) for o, n in zip(old, new))
        return old

    return merge(state, new_state)


def subpixel_to_transposed(kernel, r: int):
    """Rearrange a SAME 3x3 sub-pixel conv kernel (3,3,C,C*r^2) into the
    equivalent input-dilated ("transposed") conv kernel (3r,3r,C,C).

    conv3x3(x) + depth_to_space(r) computes
        out[b, r*y+i, r*x+j, c] = conv_out[b, y, x, c*r^2 + i*r + j]
    (torch PixelShuffle channel order, nn/layers.py:pixel_shuffle). The
    same map as ONE conv over the r-dilated input with window index
        t = r*dy + (r-1) - i     (pad lo = hi = r*p + r - 1, p = 1)
    — verified bit-level against conv+shuffle in tests. Serving rationale:
    avoids materializing the C*r^2-channel intermediate AND the shuffle
    transpose (the two biggest HBM consumers of the upscale stages at the
    post-shuffle resolutions). A measured design point, not a default:
    XLA may lower input-dilated convs without exploiting phase sparsity,
    quadrupling FLOPs — see tools/bench_trunk_v2.py."""
    k = kernel.shape[0]
    C = kernel.shape[2]
    Co = kernel.shape[3] // (r * r)
    # (k,k,C,Co*r*r) -> (k,k,C,Co,r,r) -> scatter into (r*k, r*k, C, Co)
    kr = kernel.reshape(k, k, C, Co, r, r)
    w = jnp.zeros((r * k, r * k, C, Co), kernel.dtype)
    for dy in range(k):
        for dx in range(k):
            for i in range(r):
                for j in range(r):
                    w = w.at[r * dy + (r - 1) - i,
                             r * dx + (r - 1) - j].set(kr[dy, dx, :, :, i, j])
    return w


def upscale_transposed(h, stage, r: int, compute_dtype=None):
    """One upscale stage (conv + pixel-shuffle + PReLU) as a single
    input-dilated conv with `subpixel_to_transposed` weights. The
    sub-pixel bias is phase-dependent (bias[c*r^2+i*r+j] lands at output
    phase (i,j)), so it is added via a broadcast over the (H, r, W, r, C)
    view rather than a per-channel conv bias."""
    from jax import lax
    from sisr_tpu.nn.layers import prelu_apply

    kernel = stage["conv"]["kernel"]
    bias = stage["conv"]["bias"]
    w = subpixel_to_transposed(kernel, r)
    x = h
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    p = (kernel.shape[0] - 1) // 2
    lo = r * p + r - 1
    y = lax.conv_general_dilated(
        x, w, (1, 1), [(lo, lo), (lo, lo)], lhs_dilation=(r, r),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    B, H2, W2, C = y.shape
    bias_phase = bias.reshape(C, r, r).transpose(1, 2, 0).astype(y.dtype)
    y = (y.reshape(B, H2 // r, r, W2 // r, r, C)
         + bias_phase[None, None, :, None, :, :]).reshape(B, H2, W2, C)
    return prelu_apply(stage["prelu"], y)


def deploy_apply(folded_params, x, gen_cfg: GeneratorConfig, *,
                 use_pallas_trunk: bool = False,
                 use_pallas_upscale: bool = False,
                 use_transposed_upscale: bool = False,
                 compute_dtype=None, interpret: bool = False):
    """Inference forward over FOLDED params (fold_generator output): the
    lean deploy pipeline — stem, residual trunk, upscale stages, end conv —
    with optional fused Pallas kernels for the trunk and the
    conv+depth-to-space+PReLU upscale stages (BASELINE.json north star)."""
    from sisr_tpu.nn.layers import conv2d_apply, pixel_shuffle, prelu_apply
    from sisr_tpu.ops.pallas.fused_upscale import fused_conv_shuffle_prelu
    from sisr_tpu.ops.pallas.trunk import fused_trunk

    # collect suffix levels outermost-first, then the base
    levels = []
    node = folded_params
    while "base" in node:
        levels.append(node)
        node = node["base"]
    base = node

    def upscale_stage(h, stage, r):
        if use_transposed_upscale:
            return upscale_transposed(h, stage, r,
                                      compute_dtype=compute_dtype)
        if use_pallas_upscale and r == 2:
            return fused_conv_shuffle_prelu(
                h, stage["conv"]["kernel"], stage["conv"]["bias"],
                stage["prelu"]["alpha"], interpret=interpret)
        y = conv2d_apply(stage["conv"], h, padding=1,
                         compute_dtype=compute_dtype)
        y = pixel_shuffle(y, r)
        return prelu_apply(stage["prelu"], y)

    h = conv2d_apply(base["first_layers"]["conv"], x, padding=4,
                     compute_dtype=compute_dtype)
    h = prelu_apply(base["first_layers"]["prelu"], h)

    if use_pallas_trunk:
        # tile_b=1 pins the measured-good v1 schedule; the v2 batch-tiled
        # schedule (trunk.py:_kernel_tiled) flips in once its on-chip
        # design-point measurement lands (tools/bench_trunk_v2.py).
        h = fused_trunk(h, base, tile_b=1, interpret=interpret)
    else:
        h0 = h
        for bp in base["blocks"]:
            y = conv2d_apply(bp["conv1"], h, padding=1,
                             compute_dtype=compute_dtype)
            y = prelu_apply(bp["prelu"], y)
            y = conv2d_apply(bp["conv2"], y, padding=1,
                             compute_dtype=compute_dtype)
            h = h + y
        h = conv2d_apply(base["block_end"]["conv"], h, padding=1,
                         compute_dtype=compute_dtype) + h0

    for i, stage in enumerate(base["upscale"]):
        h = upscale_stage(h, stage, gen_cfg.list_scales[i])
    for lvl in reversed(levels):  # innermost suffix applies first
        h = upscale_stage(h, lvl["upscale"], 2)

    h = conv2d_apply(base["end"]["conv"], h, padding=1,
                     compute_dtype=compute_dtype)
    return jnp.tanh(h.astype(jnp.float32))


def make_deploy_fn(params, state, gen_cfg: GeneratorConfig, *,
                   use_pallas_trunk: bool = False,
                   use_pallas_upscale: bool = False,
                   use_transposed_upscale: bool = False, compute_dtype=None):
    """Fold BN/SN constants and return a jitted deploy-mode SR function."""
    fp, _ = fold_generator(params, state, gen_cfg)

    @jax.jit
    def fwd(x):
        return deploy_apply(fp, x, gen_cfg,
                            use_pallas_trunk=use_pallas_trunk,
                            use_pallas_upscale=use_pallas_upscale,
                            use_transposed_upscale=use_transposed_upscale,
                            compute_dtype=compute_dtype)

    return fwd


def make_sr_fn(gen_cfg: GeneratorConfig, *, compute_dtype=None,
               batch_stats: bool = True):
    """Jitted fixed-shape SR forward. `batch_stats=True` matches the
    reference's always-train-mode BN (visualisation.py never calls eval);
    False uses the checkpointed running stats."""

    @jax.jit
    def fwd(params, state, x):
        y, _ = generator_apply(params, state, x, train=batch_stats,
                               cfg=gen_cfg, compute_dtype=compute_dtype)
        return y

    return fwd


def receptive_field_lr(gen_cfg: GeneratorConfig) -> int:
    """Pixels of edge bleed at LR scale: 9x9 stem (+4), 2 convs per block,
    trunk-end conv, and one conv per upscale stage (upscale convs act before
    depth-to-space, so still at LR scale)."""
    n_up = len(gen_cfg.list_scales) + gen_cfg.n_suffixes
    return 4 + 2 * gen_cfg.n_blocks + 1 + n_up + 1  # +1 end conv (post-shuffle, conservative)


def tiled_sr(params, state, image: np.ndarray, gen_cfg: GeneratorConfig, *,
             tile: int = 128, margin: Optional[int] = None,
             tile_batch: int = 16, compute_dtype=None,
             batch_stats: bool = False, fwd=None) -> np.ndarray:
    """Super-resolve one large NHWC image (or HWC) via valid-region tiling.

    The LR plane is covered by `tile`x`tile` patches overlapping by
    2*margin; each SR patch is cropped by `margin*scale` on every non-
    boundary edge before pasting, so every output pixel comes from a patch
    where it sits outside the receptive-field bleed — the result is exact
    (fp-identical up to conv tiling) vs direct full-image inference, at a
    fixed compiled shape for any image size. `margin` defaults to the
    generator's analytic receptive field.

    Tiling requires input-independent normalization, so BN runs on the
    checkpointed running stats (`batch_stats=False`) — per-tile batch stats
    would give each tile different statistics and produce seams.

    `fwd` overrides the per-tile forward with any (params, state, x) -> sr
    callable of the same geometry — e.g. a folded deploy fn from
    make_deploy_fn (wrap it as `lambda p, s, x: deploy(x)`).
    """
    scale = gen_cfg.scale
    squeeze = image.ndim == 3
    if squeeze:
        image = image[None]
    _, H, W, C = image.shape
    if margin is None:
        margin = receptive_field_lr(gen_cfg)

    if fwd is None:
        fwd = make_sr_fn(gen_cfg, compute_dtype=compute_dtype,
                         batch_stats=batch_stats)

    if H <= tile and W <= tile:
        out = np.asarray(fwd(params, state, jnp.asarray(image)))
        return out[0] if squeeze else out

    stride = tile - 2 * margin
    if stride <= 0:
        raise ValueError(f"tile {tile} too small for margin {margin}")

    def _starts(n):
        if n <= tile:
            return [0]
        ss = list(range(0, n - tile, stride))
        ss.append(n - tile)
        return ss

    ys, xs = _starts(H), _starts(W)
    coords = [(y, x) for y in ys for x in xs]
    patches = np.stack([image[0, y:y + tile, x:x + tile] for y, x in coords])

    k = len(coords)
    sr_patches = np.zeros((k, tile * scale, tile * scale, C), np.float32)
    for b in range(0, math.ceil(k / tile_batch) * tile_batch, tile_batch):
        chunk = patches[b:b + tile_batch]
        n_real = len(chunk)
        if n_real == 0:
            break
        if n_real < tile_batch:  # pad to the compiled batch shape
            chunk = np.concatenate(
                [chunk, np.zeros((tile_batch - n_real, tile, tile, C),
                                 np.float32)])
        out = np.asarray(fwd(params, state, jnp.asarray(chunk)))
        sr_patches[b:b + n_real] = out[:n_real]

    result = np.zeros((H * scale, W * scale, C), np.float32)
    m = margin
    for (y, x), sr in zip(coords, sr_patches):
        t0 = 0 if y == 0 else m            # crop (LR units)
        l0 = 0 if x == 0 else m
        b0 = 0 if y + tile == H else m
        r0 = 0 if x + tile == W else m
        result[(y + t0) * scale:(y + tile - b0) * scale,
               (x + l0) * scale:(x + tile - r0) * scale] = \
            sr[t0 * scale:(tile - b0) * scale, l0 * scale:(tile - r0) * scale]
    return result if squeeze else result[None]
