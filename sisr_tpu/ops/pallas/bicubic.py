"""Pallas kernel: fused bicubic downsample + clamp to [-1, 1].

The LR-synthesis preprocessing path (reference utils.py:16-31) as one
VMEM-resident kernel: both separable tap contractions run on the MXU and
the clamp is applied before the single store — the (oh, W, C) intermediate
never touches HBM (SURVEY.md §7 'Pallas kernel #1'). Tap matrices are the
same torch-parity weights as ops/resize.py.

One grid step per batch element; fp32 throughout (the LR distribution is a
training-semantics contract).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sisr_tpu.ops.resize import bicubic_weight_matrix


def _kernel(x_ref, ah_ref, aw_ref, o_ref, *, H, W, C, oh, ow):
    x = x_ref[0].astype(jnp.float32).reshape(H, W * C)
    # rows: (oh, H) @ (H, W*C) -> (oh, W*C)
    y = jnp.dot(ah_ref[...], x, preferred_element_type=jnp.float32)
    y = y.reshape(oh, W, C)
    # cols: contract W with (ow, W) -> (ow, oh, C) -> (oh, ow, C)
    y = jax.lax.dot_general(aw_ref[...], y, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = jnp.swapaxes(y, 0, 1)
    o_ref[0] = jnp.clip(y, -1.0, 1.0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_hw", "interpret"))
def bicubic_clamp_pallas(x, out_hw, *, interpret: bool = False):
    """NHWC bicubic resize (align_corners=True, torch taps) + clamp[-1,1]."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    ah = bicubic_weight_matrix(H, oh)
    aw = bicubic_weight_matrix(W, ow)
    kern = functools.partial(_kernel, H=H, W=W, C=C, oh=oh, ow=ow)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh, ow, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, oh, ow, C), x.dtype),
        interpret=interpret,
    )(x, ah, aw)
