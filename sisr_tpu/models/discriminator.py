"""SRGAN discriminator, TPU-native functional form.

Parity with reference model_discriminator.py:18-76: SN-conv3x3 stem (stride
from the list) + LeakyReLU, then 7 blocks [SN-conv3x3 -> BN -> LeakyReLU]
with the SRGAN feature/stride ladder, flatten, Linear(fc_in -> 2*last) ->
LeakyReLU -> Linear(-> 1) -> Sigmoid. The flatten-size contract (stride
divisibility asserts, model_discriminator.py:27-36) lives in
DiscriminatorConfig.__post_init__.

We return the sigmoid probability (as the reference does) but also expose
logits for numerically-stable BCE (the loss layer consumes logits).
Flatten order is NHWC-native (h, w, c); the torch-import tool permutes fc
weights accordingly when transplanting torch checkpoints.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sisr_tpu.config import DiscriminatorConfig
from sisr_tpu.nn.layers import (
    batchnorm_apply,
    batchnorm_init,
    conv2d_apply,
    conv2d_init,
    leaky_relu,
    linear_apply,
    linear_init,
)
from sisr_tpu.nn.spectral_norm import sn_init, sn_normalize

#: run the stem in space-to-depth space when the ladder starts (s1, s2)
#: — perf toggle, numerics identical either way (see discriminator_apply)
FUSE_STEM = True

#: run the fused s2d stem as ONE pallas kernel (ops/pallas/fused_stem.py:
#: both convs + the LeakyReLU in a single VMEM pass, custom VJP) instead of
#: two XLA convs. Requires FUSE_STEM preconditions + compute_dtype; falls
#: back to the XLA pair otherwise. Numerics: same dot products with fp32
#: bias/lrelu staging between them (exact-tested in tests/test_fused_stem).
PALLAS_STEM = False
_PALLAS_INTERPRET = False  # tests flip this to run the kernel on CPU
#: largest half-resolution pixel count the kernel is sized for (VMEM):
#: covers every training HR geometry (<= 128x128 input)
_PALLAS_STEM_MAX_HW = 4096


def discriminator_init(key, cfg: DiscriminatorConfig):
    nfs, strides = cfg.list_n_features, cfg.list_stride
    keys = jax.random.split(key, 2 * len(nfs) + 2)

    c0 = conv2d_init(keys[0], 3, 3, cfg.input_shape[0], nfs[0])
    params = {"stem": {"conv": c0}}
    state = {"stem": {"conv": sn_init(keys[1], c0["kernel"])}}

    blocks_p, blocks_s = [], []
    for i in range(1, len(nfs)):
        kp, ks = keys[2 * i], keys[2 * i + 1]
        cp = conv2d_init(kp, 3, 3, nfs[i - 1], nfs[i])
        bp, bs = batchnorm_init(nfs[i])
        blocks_p.append({"conv": cp, "bn": bp})
        blocks_s.append({"conv": sn_init(ks, cp["kernel"]), "bn": bs})
    params["blocks"], state["blocks"] = blocks_p, blocks_s

    params["fc1"] = linear_init(keys[-2], cfg.fc_in, cfg.fc_mid)
    params["fc2"] = linear_init(keys[-1], cfg.fc_mid, 1)
    return params, state


def discriminator_sn_update(params, state):
    """One spectral-norm power iteration on every SN conv, standalone.

    SN updates are input-independent, so the per-forward iteration the
    reference's hooks perform can be hoisted out of batched multi-slot
    forwards: update (u, v) once here, then run every slot with
    sn_train=False on the returned state."""
    ns = {"stem": dict(state["stem"]), "blocks": [dict(b) for b in state["blocks"]]}
    _, ns["stem"]["conv"] = sn_normalize(params["stem"]["conv"]["kernel"],
                                         state["stem"]["conv"], train=True)
    for i, (bp, bs) in enumerate(zip(params["blocks"], state["blocks"])):
        _, ns["blocks"][i]["conv"] = sn_normalize(bp["conv"]["kernel"],
                                                  bs["conv"], train=True)
    return ns


def discriminator_features(params, state, x, *, cfg: DiscriminatorConfig,
                           taps, compute_dtype=None):
    """D-as-perceptual-extractor: post-activation outputs of the ladder
    blocks in `taps`, flattened and concatenated to (B, -1).

    The egress-free stand-in for the reference's pretrained-VGG content
    loss (model_content_extractor.py:33-60): a feature-matching loss on the
    discriminator's own intermediate activations reuses learned weights
    already in the checkpoint (Salimans et al. 2016 feature matching, a
    standard SRGAN-family variant). Behaves like MaskedVGG the extractor:
    deterministic eval pass — BN reads running stats, SN reuses the current
    (u, v) with no power iteration — and fully convolutional (no fc head),
    so it accepts any input size (the unsupervised mode feeds LR-sized
    images, reference train.py:95-97).

    Gradients flow through the activations into the G image (like VGG);
    the caller's loss must not differentiate w.r.t. D params.
    """
    cd = compute_dtype
    kernel, _ = sn_normalize(params["stem"]["conv"]["kernel"],
                             state["stem"]["conv"], train=False)
    x = conv2d_apply(params["stem"]["conv"], x, stride=cfg.list_stride[0],
                     padding=1, compute_dtype=cd, kernel_override=kernel)
    x = leaky_relu(x)
    feats = []
    last = max(taps)
    for i, (bp, bs) in enumerate(zip(params["blocks"], state["blocks"])):
        kernel, _ = sn_normalize(bp["conv"]["kernel"], bs["conv"], train=False)
        y = conv2d_apply(bp["conv"], x, stride=cfg.list_stride[i + 1],
                         padding=1, compute_dtype=cd, kernel_override=kernel)
        y, _ = batchnorm_apply(bp["bn"], bs["bn"], y, train=False)
        x = leaky_relu(y)
        if i in taps:
            feats.append(x.astype(jnp.float32).reshape(x.shape[0], -1))
        if i == last:
            break
    return jnp.concatenate(feats, axis=1)


def discriminator_apply(params, state, x, *, train: bool, cfg: DiscriminatorConfig,
                        compute_dtype=None, bn_axis: Optional[str] = None,
                        return_logits: bool = False, sn_train: Optional[bool] = None):
    """Returns ((prob or logit) of shape (B,), new_state).

    `sn_train` decouples the spectral-norm power iteration from BN's
    batch-stats mode: the replay-slot forwards in the D update run BN in
    train mode (batch stats, running-stat chaining — reference semantics)
    but reuse the current (u, v) instead of iterating once per slot; SN
    updates are input-independent, so this only changes the power-iteration
    count per step, not what (u, v) converge to.
    """
    cd = compute_dtype
    if sn_train is None:
        sn_train = train
    ns = {"stem": {}, "blocks": []}

    kernel, s = sn_normalize(params["stem"]["conv"]["kernel"],
                             state["stem"]["conv"], train=sn_train)
    ns["stem"]["conv"] = s

    # fused s2d stem: when the stem is stride 1 and the first block strides
    # by 2 (the SRGAN ladder), run the stem in space-to-depth space — phase-
    # packed output channels — and feed block 0's stride-2 conv (itself an
    # s2d + stride-1 2x2 conv, nn/layers.py) directly. The full-resolution
    # stem activation is never materialized: at the D update's effective
    # batch (12 slots x 16) that map is ~0.8 GB/step of HBM traffic, and the
    # C_in=3 conv runs 4x more MXU-efficient phase-packed (measured 9 TF/s
    # -> see tools/bench_d_layers.py). Numerics: identical dot products (fp
    # reassociation aside).
    from sisr_tpu.nn.layers import (
        _s2d_kernel_stride1_phases,
        _s2d_kernel_stride2,
        space_to_depth2,
    )
    from jax import lax

    first_stride = cfg.list_stride[0]
    fuse_stem = (FUSE_STEM and first_stride == 1 and len(cfg.list_stride) > 1
                 and cfg.list_stride[1] == 2
                 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
    start_block = 0
    if fuse_stem:
        bp, bs = params["blocks"][0], state["blocks"][0]
        k0, s0 = sn_normalize(bp["conv"]["kernel"], bs["conv"], train=sn_train)
        use_pallas = (PALLAS_STEM and cd is not None
                      and (x.shape[1] // 2) * (x.shape[2] // 2)
                      <= _PALLAS_STEM_MAX_HW)
        if use_pallas:
            from sisr_tpu.ops.pallas.fused_stem import make_fused_stem
            fpal = make_fused_stem(interpret=_PALLAS_INTERPRET,
                                   compute_dtype=cd, slope=0.01)
            y = fpal(space_to_depth2(x).astype(cd),
                     _s2d_kernel_stride1_phases(kernel).astype(cd),
                     jnp.tile(params["stem"]["conv"]["bias"], 4),
                     _s2d_kernel_stride2(k0).astype(cd),
                     bp["conv"]["bias"])
        else:
            if cd is not None:
                x = x.astype(cd)
                kernel = kernel.astype(cd)
            xs = space_to_depth2(x)
            y = lax.conv_general_dilated(
                xs, _s2d_kernel_stride1_phases(kernel), (1, 1),
                [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y + jnp.tile(params["stem"]["conv"]["bias"], 4) \
                .astype(y.dtype)
            y = leaky_relu(y)  # == space_to_depth2(leaky_relu(stem_out))

            k0c = k0.astype(cd) if cd is not None else k0
            y = lax.conv_general_dilated(
                y, _s2d_kernel_stride2(k0c), (1, 1), [(1, 0), (1, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y + bp["conv"]["bias"].astype(y.dtype)
        y, bns = batchnorm_apply(bp["bn"], bs["bn"], y, train=train,
                                 axis_name=bn_axis)
        x = leaky_relu(y)
        ns["blocks"].append({"conv": s0, "bn": bns})
        start_block = 1
    else:
        # explicit padding=1: XLA 'SAME' pads (0,1) for stride-2 convs,
        # torch's padding=1 pads (1,1) — tap alignment must match
        x = conv2d_apply(params["stem"]["conv"], x, stride=first_stride,
                         padding=1, compute_dtype=cd, kernel_override=kernel)
        x = leaky_relu(x)

    for i, (bp, bs) in enumerate(zip(params["blocks"], state["blocks"])):
        if i < start_block:
            continue
        stride = cfg.list_stride[i + 1]
        kernel, s = sn_normalize(bp["conv"]["kernel"], bs["conv"], train=sn_train)
        y = conv2d_apply(bp["conv"], x, stride=stride, padding=1,
                         compute_dtype=cd, kernel_override=kernel)
        y, bns = batchnorm_apply(bp["bn"], bs["bn"], y, train=train, axis_name=bn_axis)
        x = leaky_relu(y)
        ns["blocks"].append({"conv": s, "bn": bns})

    b = x.shape[0]
    x = x.reshape(b, -1)
    if x.shape[1] != cfg.fc_in:
        raise ValueError(f"flatten size {x.shape[1]} != fc_in {cfg.fc_in}")
    x = linear_apply(params["fc1"], x, compute_dtype=cd)
    x = leaky_relu(x)
    x = linear_apply(params["fc2"], x, compute_dtype=cd)
    logit = x.reshape(b).astype(jnp.float32)
    if return_logits:
        return logit, ns
    return jax.nn.sigmoid(logit), ns
