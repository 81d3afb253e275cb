"""SRGAN generator, TPU-native functional form.

Capability parity with reference model_generator.py:22-141:
- Conv9x9 stem + PReLU; 16 residual blocks [conv3x3-BN-PReLU-conv3x3-BN] with
  local skip; conv3x3+BN trunk end with *global* skip; per-scale
  [conv3x3 -> depth-to-space x2 -> PReLU] upscale stages; conv3x3 + tanh end.
- spectral norm carried as (u, v) state: *unconditional* on the stem, the
  residual blocks, and the trunk-end conv (reference model_generator.py:
  10,13,33,39 wrap those in sn() regardless of use_sn); `use_sn` gates only
  the upscale and end convs (:43-63).
- `no_end=True` exposes pre-output features — the growth seam the reference
  calls forward_no_end (model_generator.py:86-96).
- progressive growth: `grow_suffix` wraps trained params with one new
  [SN-conv -> depth-to-space x2 -> PReLU] stage that *shares* the prefix's
  output conv (reference GeneratorSuffix, model_generator.py:117-141; the
  parameter-sharing list trick at :127-128 becomes plain structural sharing).
- freezing: `generator_freeze_prefixes` yields path prefixes for optimizer
  masking (replacing Generator.freeze / freeze_prefix,
  model_generator.py:103-115,130-131).

Layout NHWC; all convs accumulate fp32 on the MXU; `compute_dtype=bfloat16`
casts conv inputs/kernels only.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sisr_tpu.config import GeneratorConfig
from sisr_tpu.nn.layers import (
    batchnorm_apply,
    batchnorm_init,
    conv2d_apply,
    conv2d_init,
    pixel_shuffle,
    prelu_apply,
    prelu_init,
)
from sisr_tpu.nn.spectral_norm import sn_init, sn_normalize


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout, use_sn):
    kp, ks = jax.random.split(key)
    params = conv2d_init(kp, kh, kw, cin, cout)
    state = sn_init(ks, params["kernel"]) if use_sn else {}
    return params, state


def _conv_apply(params, state, x, *, train, stride=1, compute_dtype=None):
    if state:  # spectral norm carried state
        kernel, new_state = sn_normalize(params["kernel"], state, train=train)
    else:
        kernel, new_state = params["kernel"], state
    y = conv2d_apply(params, x, stride=stride, compute_dtype=compute_dtype,
                     kernel_override=kernel)
    return y, new_state


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _base_init(key, cfg: GeneratorConfig):
    nf, nl = cfg.n_features_block, cfg.n_features_last
    keys = jax.random.split(key, 6 + cfg.n_blocks)

    # trunk convs are spectral-normed unconditionally (reference
    # model_generator.py:10,13,33,39); use_sn gates only upscale/end (:43-63)
    p_first, s_first = _conv_init(keys[0], 9, 9, cfg.input_channels, nf, True)
    params = {"first_layers": {"conv": p_first, "prelu": prelu_init()}}
    state = {"first_layers": {"conv": s_first}}

    blocks_p, blocks_s = [], []
    for i in range(cfg.n_blocks):
        k1, k2 = jax.random.split(keys[1 + i])
        c1p, c1s = _conv_init(k1, 3, 3, nf, nf, True)
        c2p, c2s = _conv_init(k2, 3, 3, nf, nf, True)
        b1p, b1s = batchnorm_init(nf)
        b2p, b2s = batchnorm_init(nf)
        blocks_p.append({"conv1": c1p, "bn1": b1p, "prelu": prelu_init(),
                         "conv2": c2p, "bn2": b2p})
        blocks_s.append({"conv1": c1s, "bn1": b1s, "conv2": c2s, "bn2": b2s})
    params["blocks"], state["blocks"] = blocks_p, blocks_s

    cep, ces = _conv_init(keys[1 + cfg.n_blocks], 3, 3, nf, nf, True)
    bep, bes = batchnorm_init(nf)
    params["block_end"] = {"conv": cep, "bn": bep}
    state["block_end"] = {"conv": ces, "bn": bes}

    ups_p, ups_s = [], []
    for i, s in enumerate(cfg.list_scales):
        cin = nf if i == 0 else nl // cfg.list_scales[i - 1] ** 2
        up, us = _conv_init(keys[2 + cfg.n_blocks + i], 3, 3, cin, nl, cfg.use_sn)
        ups_p.append({"conv": up, "prelu": prelu_init()})
        ups_s.append({"conv": us})
    params["upscale"], state["upscale"] = ups_p, ups_s

    cend = nl // cfg.list_scales[-1] ** 2
    ep, es = _conv_init(keys[-1], 3, 3, cend, cfg.input_channels, cfg.use_sn)
    params["end"] = {"conv": ep}
    state["end"] = {"conv": es}
    return params, state


def generator_init(key, cfg: GeneratorConfig):
    """(params, state) pytrees. With cfg.n_suffixes > 0, the suffixed
    architecture is built directly (reference progressive_gan_suffix in
    {2, 4}: wrap before checkpoint load, config.py:83-88)."""
    kb, *ks = jax.random.split(key, 1 + max(cfg.n_suffixes, 0) * 2)
    base_cfg = GeneratorConfig(**{**cfg.__dict__, "n_suffixes": 0})
    params, state = _base_init(kb, base_cfg)
    for i in range(cfg.n_suffixes):
        params, state = grow_suffix(ks[i], params, state, cfg)
    return params, state


def grow_suffix(key, params, state, cfg: GeneratorConfig):
    """Wrap trained generator params with one new x2 upscale stage.

    The new stage is SN-conv(n_features_last//4 -> n_features_last) ->
    depth-to-space x2 -> PReLU; the prefix's `end` conv is shared (reference
    GeneratorSuffix, model_generator.py:117-141). This *is* the progressive
    x2 -> x4 growth operation (reference progressive_gan_suffix in {1, 3}:
    wrap after checkpoint load, config.py:94-96).
    """
    nl = cfg.n_features_last
    up, us = _conv_init(key, 3, 3, nl // 4, nl, True)  # suffix convs always SN
    new_params = {"base": params, "upscale": {"conv": up, "prelu": prelu_init()}}
    new_state = {"base": state, "upscale": {"conv": us}}
    return new_params, new_state


def n_suffix_levels(params) -> int:
    n = 0
    while "base" in params:
        n += 1
        params = params["base"]
    return n


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _fused_trunk(params, state, x, *, cfg: GeneratorConfig, compute_dtype):
    """Blocks + trunk-end + global skip as ONE pallas custom-VJP kernel
    (ops/pallas/trunk_train.py). Exact contract vs the per-layer path is
    tested in tests/test_trunk_train.py; the only numerical difference is
    that inter-op activations stay fp32 instead of rounding to bf16.
    Returns (out, ns_blocks, ns_block_end)."""
    import jax as _jax

    from sisr_tpu.nn.spectral_norm import sn_normalize
    from sisr_tpu.ops.pallas.trunk_train import (
        make_trunk_train,
        pack_trunk_weights,
    )

    norm_blocks, ns_blocks = [], []
    for bp, bs in zip(params["blocks"], state["blocks"]):
        nb, out_s = dict(bp), {}
        for c in ("conv1", "conv2"):
            k, out_s[c] = sn_normalize(bp[c]["kernel"], bs[c], train=True)
            nb[c] = {"kernel": k, "bias": bp[c]["bias"]}
        norm_blocks.append(nb)
        ns_blocks.append(out_s)
    ke, se_new = sn_normalize(params["block_end"]["conv"]["kernel"],
                              state["block_end"]["conv"], train=True)
    norm_end = {"conv": {"kernel": ke,
                         "bias": params["block_end"]["conv"]["bias"]},
                "bn": params["block_end"]["bn"]}
    w, b, gamma, beta, alpha = pack_trunk_weights(norm_blocks, norm_end)

    cd = compute_dtype if compute_dtype is not None else jnp.float32
    trunk = make_trunk_train(cfg.n_blocks,
                             interpret=_jax.default_backend() == "cpu",
                             compute_dtype=cd)
    out, mu, var = trunk(x.astype(jnp.float32), w, b, gamma, beta, alpha)
    mu = jax.lax.stop_gradient(mu)
    var = jax.lax.stop_gradient(var)

    # running-stat momentum updates, closed form == nn/layers.batchnorm_apply
    n = x.shape[0] * x.shape[1] * x.shape[2]
    unb = n / max(n - 1, 1)
    m = 0.1

    def bn_state(old, li):
        return {"mean": (1 - m) * old["mean"] + m * mu[li],
                "var": (1 - m) * old["var"] + m * var[li] * unb}

    for k_i, (out_s, bs) in enumerate(zip(ns_blocks, state["blocks"])):
        out_s["bn1"] = bn_state(bs["bn1"], 2 * k_i)
        out_s["bn2"] = bn_state(bs["bn2"], 2 * k_i + 1)
    ns_end = {"conv": se_new,
              "bn": bn_state(state["block_end"]["bn"], 2 * cfg.n_blocks)}
    return out, ns_blocks, ns_end


def _base_forward_no_end(params, state, x, *, train, cfg: GeneratorConfig,
                         compute_dtype=None, bn_axis: Optional[str] = None):
    cd = compute_dtype
    ns = {"first_layers": {}, "blocks": [], "block_end": {}, "upscale": [], "end": {}}

    x, s = _conv_apply(params["first_layers"]["conv"],
                       state["first_layers"]["conv"], x, train=train, compute_dtype=cd)
    ns["first_layers"]["conv"] = s
    x = prelu_apply(params["first_layers"]["prelu"], x)

    if cfg.fused_trunk and train and bn_axis is None:
        x, ns["blocks"], ns["block_end"] = _fused_trunk(
            params, state, x, cfg=cfg, compute_dtype=cd)
        for i, (up, us) in enumerate(zip(params["upscale"], state["upscale"])):
            x, s = _conv_apply(up["conv"], us["conv"], x, train=train,
                               compute_dtype=cd)
            ns["upscale"].append({"conv": s})
            x = pixel_shuffle(x, cfg.list_scales[i])
            x = prelu_apply(up["prelu"], x)
        return x, ns

    residual = x

    def block(x, bp, bs):
        out = {}
        y, out["conv1"] = _conv_apply(bp["conv1"], bs["conv1"], x, train=train, compute_dtype=cd)
        y, out["bn1"] = batchnorm_apply(bp["bn1"], bs["bn1"], y, train=train, axis_name=bn_axis)
        y = prelu_apply(bp["prelu"], y)
        y, out["conv2"] = _conv_apply(bp["conv2"], bs["conv2"], y, train=train, compute_dtype=cd)
        y, out["bn2"] = batchnorm_apply(bp["bn2"], bs["bn2"], y, train=train, axis_name=bn_axis)
        return x + y, out

    if cfg.remat:
        block = jax.checkpoint(block)

    for bp, bs in zip(params["blocks"], state["blocks"]):
        x, out = block(x, bp, bs)
        ns["blocks"].append(out)

    y, s = _conv_apply(params["block_end"]["conv"], state["block_end"]["conv"],
                       x, train=train, compute_dtype=cd)
    ns["block_end"]["conv"] = s
    y, ns["block_end"]["bn"] = batchnorm_apply(
        params["block_end"]["bn"], state["block_end"]["bn"], y, train=train, axis_name=bn_axis)

    x = y + residual

    for i, (up, us) in enumerate(zip(params["upscale"], state["upscale"])):
        x, s = _conv_apply(up["conv"], us["conv"], x, train=train, compute_dtype=cd)
        ns["upscale"].append({"conv": s})
        x = pixel_shuffle(x, cfg.list_scales[i])
        x = prelu_apply(up["prelu"], x)
    return x, ns


def _end_params(params):
    """Descend suffix wrappers to the shared output conv."""
    while "base" in params:
        params = params["base"]
    return params["end"]


def _forward_no_end(params, state, x, *, train, cfg, compute_dtype=None, bn_axis=None):
    if "base" in params:  # suffix level
        y, ns_base = _forward_no_end(params["base"], state["base"], x, train=train,
                                     cfg=cfg, compute_dtype=compute_dtype, bn_axis=bn_axis)
        y, s = _conv_apply(params["upscale"]["conv"], state["upscale"]["conv"],
                           y, train=train, compute_dtype=compute_dtype)
        y = pixel_shuffle(y, 2)
        y = prelu_apply(params["upscale"]["prelu"], y)
        return y, {"base": ns_base, "upscale": {"conv": s}}
    return _base_forward_no_end(params, state, x, train=train, cfg=cfg,
                                compute_dtype=compute_dtype, bn_axis=bn_axis)


def generator_apply(params, state, x, *, train: bool, cfg: GeneratorConfig,
                    compute_dtype=None, bn_axis: Optional[str] = None,
                    no_end: bool = False):
    """Forward pass. Returns (output, new_state).

    `no_end=True` returns pre-output features (reference forward_no_end).
    Output is tanh-bounded in [-1, 1] (reference model_generator.py:53).
    """
    y, ns = _forward_no_end(params, state, x, train=train, cfg=cfg,
                            compute_dtype=compute_dtype, bn_axis=bn_axis)
    if no_end:
        return y, ns

    # shared end conv: state lives at the innermost level
    pe = _end_params(params)
    se_container, nse_path = state, []
    while "base" in se_container:
        nse_path.append("base")
        se_container = se_container["base"]
    y, s_end = _conv_apply(pe["conv"], se_container["end"]["conv"], y,
                           train=train, compute_dtype=compute_dtype)
    # write end state back at the innermost level of ns
    node = ns
    for _ in nse_path:
        node = node["base"]
    node["end"] = {"conv": s_end}
    y = jnp.tanh(y.astype(jnp.float32))
    return y, ns


# ---------------------------------------------------------------------------
# freezing (as optimizer mask path-prefixes)
# ---------------------------------------------------------------------------


def generator_freeze_prefixes(n_suffix_levels: int = 0, *, freeze_upscale=False,
                              freeze_end=False):
    """Path prefixes (in the flat '/'-joined namespace) to freeze.

    With n_suffix_levels == 0 this matches Generator.freeze(freeze_upscale,
    freeze_end) (reference model_generator.py:103-115). With suffix levels,
    it freezes the whole prefix under 'base' (GeneratorSuffix freeze_prefix,
    model_generator.py:130-131): the shared end conv lives under 'base', so
    freeze_end there governs it.
    """
    root = "base/" * n_suffix_levels
    prefixes = [root + "first_layers", root + "blocks", root + "block_end"]
    if n_suffix_levels > 0:
        # intermediate suffix upscales are part of the frozen prefix
        for lvl in range(1, n_suffix_levels):
            prefixes.append("base/" * lvl + "upscale")
    if freeze_upscale:
        prefixes.append(root + "upscale")
    if freeze_end:
        prefixes.append(root + "end")
    return prefixes
