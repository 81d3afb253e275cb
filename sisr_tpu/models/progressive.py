"""Alternative progressive-growth design (wrapper-free).

Parity with reference model_generator_progressive.py:4-65 — the "22/07:
sans load_state_dict(strict=False)" rework (reference README.md:81): a
`ProgressiveBase` holds only the stem + residual trunk (no upscale, no
output head); each growth level nests the previous net and owns a FRESH
[conv -> depth-to-space x2 -> PReLU] stage plus its own [conv -> tanh]
output head. Differences from the main Generator, faithfully kept:
no spectral norm, no global residual connection, and nothing is shared
between levels' output heads (each level has its own `end`).

Functional form: params are nested {"base": ..., "upscale": ..., "end": ...}
— growing a level is pure pytree construction, no name-string surgery.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from sisr_tpu.nn.layers import (
    batchnorm_apply,
    batchnorm_init,
    conv2d_apply,
    conv2d_init,
    pixel_shuffle,
    prelu_apply,
    prelu_init,
)


def progressive_base_init(key, n_blocks: int = 16, n_features: int = 64,
                          input_channels: int = 3):
    """Stem + residual trunk only (reference GeneratorProgresiveBase,
    model_generator_progressive.py:21-44)."""
    keys = jax.random.split(key, n_blocks + 1)
    params = {"first_layers": {
        "conv": conv2d_init(keys[0], 9, 9, input_channels, n_features),
        "prelu": prelu_init()}}
    state = {"first_layers": {}}
    blocks_p, blocks_s = [], []
    for i in range(n_blocks):
        k1, k2 = jax.random.split(keys[1 + i])
        b1p, b1s = batchnorm_init(n_features)
        b2p, b2s = batchnorm_init(n_features)
        blocks_p.append({"conv1": conv2d_init(k1, 3, 3, n_features, n_features),
                         "bn1": b1p, "prelu": prelu_init(),
                         "conv2": conv2d_init(k2, 3, 3, n_features, n_features),
                         "bn2": b2p})
        blocks_s.append({"bn1": b1s, "bn2": b2s})
    params["blocks"], state["blocks"] = blocks_p, blocks_s
    return params, state


def progressive_grow(key, params, state, n_features: int = 64,
                     n_features_up: int = 256, output_channels: int = 3):
    """Nest the previous net and add a fresh upscale stage + output head
    (reference GeneratorSuffix alt design,
    model_generator_progressive.py:47-65)."""
    k1, k2 = jax.random.split(key)
    level = _n_levels(params)
    cin = n_features if level == 0 else n_features_up // 4
    new_params = {
        "base": params,
        "upscale": {"conv": conv2d_init(k1, 3, 3, cin, n_features_up),
                    "prelu": prelu_init()},
        "end": {"conv": conv2d_init(k2, 3, 3, n_features_up // 4,
                                    output_channels)},
    }
    return new_params, {"base": state}


def _n_levels(params) -> int:
    n = 0
    while "base" in params:
        n += 1
        params = params["base"]
    return n


def _base_forward(params, state, x, *, train, compute_dtype=None):
    cd = compute_dtype
    ns = {"first_layers": {}, "blocks": []}
    x = conv2d_apply(params["first_layers"]["conv"], x, padding=4,
                     compute_dtype=cd)
    x = prelu_apply(params["first_layers"]["prelu"], x)
    for bp, bs in zip(params["blocks"], state["blocks"]):
        out = {}
        y = conv2d_apply(bp["conv1"], x, padding=1, compute_dtype=cd)
        y, out["bn1"] = batchnorm_apply(bp["bn1"], bs["bn1"], y, train=train)
        y = prelu_apply(bp["prelu"], y)
        y = conv2d_apply(bp["conv2"], y, padding=1, compute_dtype=cd)
        y, out["bn2"] = batchnorm_apply(bp["bn2"], bs["bn2"], y, train=train)
        x = x + y  # local residual only; NO global skip in this design
        ns["blocks"].append(out)
    return x, ns


def _forward_no_end(params, state, x, *, train, compute_dtype=None):
    if "base" not in params:
        return _base_forward(params, state, x, train=train,
                             compute_dtype=compute_dtype)
    y, ns_base = _forward_no_end(params["base"], state["base"], x,
                                 train=train, compute_dtype=compute_dtype)
    y = conv2d_apply(params["upscale"]["conv"], y, padding=1,
                     compute_dtype=compute_dtype)
    y = pixel_shuffle(y, 2)
    y = prelu_apply(params["upscale"]["prelu"], y)
    return y, {"base": ns_base}


def progressive_apply(params, state, x, *, train: bool, compute_dtype=None):
    """Forward through the outermost level's own output head."""
    if "base" not in params:
        raise ValueError("progressive base has no output head — grow first")
    y, ns = _forward_no_end(params, state, x, train=train,
                            compute_dtype=compute_dtype)
    y = conv2d_apply(params["end"]["conv"], y, padding=1,
                     compute_dtype=compute_dtype)
    return jnp.tanh(y.astype(jnp.float32)), ns
