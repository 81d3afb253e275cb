"""Pallas kernel: fused conv3x3 -> depth-to-space(x2) -> PReLU.

The generator's upscale stage (reference model_generator.py:44-49:
Conv2d(64->256, 3x3) -> PixelShuffle(2) -> PReLU) is the costliest part of
the SR fast path — the conv runs at the largest pre-output spatial size and
its 256-channel output is immediately re-laid-out by depth-to-space. Fusing
the three ops keeps the conv accumulator in VMEM and writes the
shuffle-ordered result directly, skipping one full HBM round trip of the
256-channel map (BASELINE.json north star: "fused conv+pixel-shuffle
kernels at speed-of-light HBM bandwidth").

Design (one grid step per batch element; everything resident in VMEM):
- input arrives pre-padded (H+2, W+2, Cin);
- the 3x3 conv is 9 MXU dots accumulated in fp32: for each tap (dy, dx),
  x[dy:dy+H, dx:dx+W, :] reshaped (H*W, Cin) @ W9[tap] (Cin, Cout);
- the conv weights are pre-permuted on the host so output channels are
  grouped by shuffle offset: block k = i*2+j holds the Cout/4 channels that
  land at spatial offset (i, j) — depth-to-space then needs only contiguous
  channel slices + stack/reshape interleaves, no lane-dim gather;
- PReLU applied in-register before the single store.

Correctness is tested in interpret mode against the unfused XLA path
(tests/test_pallas.py) and on-device in the verify drive.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _permute_weights(kernel, bias, r: int = 2):
    """HWIO (3,3,Cin,Cout) -> (r*r, 9, Cin, C) grouped by shuffle offset.

    torch PixelShuffle maps conv output channel c*r*r + i*r + j to spatial
    offset (i, j) with depth index c; group q = i*r+j therefore selects
    channels [c*r*r + q for c in range(C)].
    """
    kh, kw, cin, cout = kernel.shape
    c = cout // (r * r)
    perm = np.asarray(
        [cc * r * r + q for q in range(r * r) for cc in range(c)], np.int32)
    wq = kernel.reshape(kh * kw, cin, cout)[:, :, perm]     # (9, cin, r*r*c)
    wq = wq.reshape(kh * kw, cin, r * r, c)
    wq = jnp.transpose(wq, (2, 0, 1, 3))                    # (r*r, 9, cin, c)
    return wq, bias[perm].reshape(r * r, c)


def _kernel(x_ref, w_ref, b_ref, alpha_ref, o_ref, *, H, W, cin, cout, r):
    """Per-offset accumulation + strided stores: Mosaic lowers stride-2
    sublane stores fine, while the 5D reshape/transpose formulation of
    depth-to-space does not. Weights arrive pre-grouped (r*r, 9, Cin, C)."""
    c = cout // (r * r)
    alpha = alpha_ref[0, 0]
    for q in range(r * r):
        i, j = q // r, q % r
        acc = jnp.zeros((H * W, c), jnp.float32)
        for tap in range(9):
            dy, dx = tap // 3, tap % 3
            patch = x_ref[0, dy:dy + H, dx:dx + W, :].reshape(H * W, cin)
            acc += jnp.dot(patch, w_ref[q, tap],
                           preferred_element_type=jnp.float32)
        acc += b_ref[q].astype(jnp.float32)
        acc = jnp.where(acc >= 0, acc, alpha * acc)
        o_ref[0, i::r, j::r, :] = acc.reshape(H, W, c).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(xp, w9, bias, alpha, *, interpret=False):
    B, Hp, Wp, cin = xp.shape
    H, W = Hp - 2, Wp - 2
    r = 2
    c = w9.shape[-1]               # w9: (r*r, 9, cin, c)
    cout = w9.shape[0] * c
    kern = functools.partial(_kernel, H=H, W=W, cin=cin, cout=cout, r=r)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, H * r, W * r, c), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        # fp32 output always: Mosaic only lowers the stride-2 sublane stores
        # for 32-bit data (bf16 inputs still feed the MXU dots as bf16)
        out_shape=jax.ShapeDtypeStruct((B, H * r, W * r, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 2 ** 20),
        interpret=interpret,
    )(xp, w9, bias, alpha)


def fused_conv_shuffle_prelu(x, kernel, bias, alpha, *, interpret=False):
    """x (B,H,W,Cin) float; kernel HWIO (3,3,Cin,Cout); Cout % 4 == 0.
    Returns PReLU(depth_to_space_2(conv3x3(x))) of shape (B,2H,2W,Cout/4).
    """
    w9, bperm = _permute_weights(kernel, bias)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    alpha2 = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
    return _run(xp, jnp.asarray(w9), jnp.asarray(bperm), alpha2,
                interpret=interpret)
