"""Pallas kernel: fused bicubic downsample + clamp to [-1, 1].

The LR-synthesis preprocessing path (reference utils.py:16-31) as one
VMEM-resident kernel: both separable tap contractions run on the MXU and
the clamp is applied before the single store — the (oh, W) intermediate
never touches HBM (SURVEY.md §7 'Pallas kernel #1'). Tap matrices are the
same torch-parity weights as ops/resize.py.

Mosaic layout note: image channels are folded into the grid (one program
per (batch, channel) plane) so every in-kernel operand is a clean 2D
(sublane, lane) matrix — merging W with a 3-wide channel axis is an
unsupported shape cast. The NHWC<->planar transposes happen outside the
kernel in XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sisr_tpu.ops.resize import bicubic_weight_matrix


def _kernel(x_ref, ah_ref, awt_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)
    # rows: (oh, H) @ (H, W) -> (oh, W); cols: (oh, W) @ (W, ow) -> (oh, ow).
    # HIGHEST precision: fp32 tap parity is a training-semantics contract
    # (default MXU precision is bf16-pass and drifts ~1e-2).
    hi = jax.lax.Precision.HIGHEST
    y = jnp.dot(ah_ref[...], x, precision=hi,
                preferred_element_type=jnp.float32)
    y = jnp.dot(y, awt_ref[...], precision=hi,
                preferred_element_type=jnp.float32)
    o_ref[0] = jnp.clip(y, -1.0, 1.0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_hw", "interpret"))
def bicubic_clamp_pallas(x, out_hw, *, interpret: bool = False):
    """NHWC bicubic resize (align_corners=True, torch taps) + clamp[-1,1]."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    ah = bicubic_weight_matrix(H, oh)
    awt = bicubic_weight_matrix(W, ow).T
    planes = jnp.transpose(x, (0, 3, 1, 2)).reshape(B * C, H, W)
    out = pl.pallas_call(
        _kernel,
        grid=(B * C,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh, ow), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * C, oh, ow), x.dtype),
        interpret=interpret,
    )(planes, ah, awt)
    return jnp.transpose(out.reshape(B, C, oh, ow), (0, 2, 3, 1))
