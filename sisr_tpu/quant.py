"""Int8 quantized serving path (beyond-reference capability).

The reference serves fp32 through torch (visualisation.py:52-53). On TPU
v5e the MXU's int8 path has 2x the peak throughput of bf16 (394 vs 197
TOPS), so the deploy pipeline gains a quantized mode:

- weights: per-output-channel symmetric int8, folded from the BN/SN-folded
  deploy params (infer.fold_generator) so quantization sees the exact
  serving-time kernels;
- activations: dynamic per-tensor symmetric int8 (one amax reduction per
  conv input — XLA fuses it into the producer's epilogue);
- accumulation in int32 on the MXU, fp32 epilogue
  (acc * s_x * s_w[c] + bias), PReLU / residual adds / pixel-shuffle in
  fp32, tanh output.

Quality impact is measured, never assumed: tests bound int8-vs-fp32 error
on random nets, and tools/eval_quality.py --quant reports PSNR/SSIM of the
quantized path on trained checkpoints next to the fp32 deploy numbers.
"""
from __future__ import annotations

from typing import FrozenSet

import jax
import jax.numpy as jnp
from jax import lax

from sisr_tpu.config import GeneratorConfig
from sisr_tpu.infer import fold_generator
from sisr_tpu.nn.layers import conv2d_apply, pixel_shuffle, prelu_apply


def quantize_conv(conv_p):
    """Per-output-channel symmetric int8 quantization of one folded conv.

    kernel (kh, kw, cin, cout) -> {'q': int8 kernel, 'scale': (cout,) fp32,
    'bias': (cout,) fp32}. scale = amax(|W|, per cout)/127; zero channels
    get scale 1 to avoid 0/0.
    """
    k = conv_p["kernel"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=(0, 1, 2))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale,
            "bias": conv_p["bias"].astype(jnp.float32)}


def conv2d_q(qconv, x, *, padding: int):
    """int8 x int8 -> int32 conv with dynamic per-tensor activation scale.

    Returns fp32. The amax is over the whole tensor (batch included): one
    scalar keeps the rescale a cheap broadcast and matches how a serving
    batch is one unit of work.
    """
    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    pad = [(padding, padding), (padding, padding)]
    acc = lax.conv_general_dilated(
        xq, qconv["q"],
        window_strides=(1, 1),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (s_x * qconv["scale"]) + qconv["bias"]


def quantize_deploy(folded_params, *, keep_fp: FrozenSet[str] = frozenset()):
    """Quantize a fold_generator() params tree to int8.

    `keep_fp` names stages left in floating point (forwarded unchanged and
    run through the normal conv at serving time): any of {'stem', 'end',
    'upscale'}. The trunk (the FLOPs) is always quantized.
    """
    def q_level(p):
        out = {}
        if "base" in p:
            out["base"] = q_level(p["base"])
            up = p["upscale"]
            out["upscale"] = (
                {"conv": up["conv"], "prelu": up["prelu"], "fp": True}
                if "upscale" in keep_fp else
                {"conv": quantize_conv(up["conv"]), "prelu": up["prelu"]})
            return out
        fl = p["first_layers"]
        out["first_layers"] = (
            {"conv": fl["conv"], "prelu": fl["prelu"], "fp": True}
            if "stem" in keep_fp else
            {"conv": quantize_conv(fl["conv"]), "prelu": fl["prelu"]})
        out["blocks"] = [{"conv1": quantize_conv(bp["conv1"]),
                          "prelu": bp["prelu"],
                          "conv2": quantize_conv(bp["conv2"])}
                         for bp in p["blocks"]]
        out["block_end"] = {"conv": quantize_conv(p["block_end"]["conv"])}
        out["upscale"] = [
            {"conv": up["conv"], "prelu": up["prelu"], "fp": True}
            if "upscale" in keep_fp else
            {"conv": quantize_conv(up["conv"]), "prelu": up["prelu"]}
            for up in p["upscale"]]
        out["end"] = ({"conv": p["end"]["conv"], "fp": True}
                      if "end" in keep_fp else
                      {"conv": quantize_conv(p["end"]["conv"])})
        return out

    return q_level(folded_params)


def _conv_stage(stage, x, *, padding: int):
    if stage.get("fp"):
        return conv2d_apply(stage["conv"], x, padding=padding,
                            compute_dtype=jnp.bfloat16).astype(jnp.float32)
    return conv2d_q(stage["conv"], x, padding=padding)


def deploy_apply_int8(qparams, x, gen_cfg: GeneratorConfig):
    """Quantized mirror of infer.deploy_apply over quantize_deploy params."""
    levels = []
    node = qparams
    while "base" in node:
        levels.append(node)
        node = node["base"]
    base = node

    def upscale_stage(h, stage, r):
        y = _conv_stage(stage, h, padding=1)
        y = pixel_shuffle(y, r)
        return prelu_apply(stage["prelu"], y)

    h = _conv_stage(base["first_layers"], x.astype(jnp.float32), padding=4)
    h = prelu_apply(base["first_layers"]["prelu"], h)

    h0 = h
    for bp in base["blocks"]:
        y = conv2d_q(bp["conv1"], h, padding=1)
        y = prelu_apply(bp["prelu"], y)
        y = conv2d_q(bp["conv2"], y, padding=1)
        h = h + y
    h = conv2d_q(base["block_end"]["conv"], h, padding=1) + h0

    for i, stage in enumerate(base["upscale"]):
        h = upscale_stage(h, stage, gen_cfg.list_scales[i])
    for lvl in reversed(levels):
        h = upscale_stage(h, lvl["upscale"], 2)

    h = _conv_stage(base["end"], h, padding=1)
    return jnp.tanh(h)


def make_deploy_fn_int8(params, state, gen_cfg: GeneratorConfig, *,
                        keep_fp: FrozenSet[str] = frozenset()):
    """Fold BN/SN, quantize to int8, return a jitted quantized SR fn."""
    fp, _ = fold_generator(params, state, gen_cfg)
    qp = quantize_deploy(fp, keep_fp=keep_fp)

    @jax.jit
    def fwd(x):
        return deploy_apply_int8(qp, x, gen_cfg)

    return fwd
