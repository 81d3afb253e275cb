"""Functional NN layers (init/apply pairs) with PyTorch-parity semantics.

Layout is NHWC (TPU-native); conv kernels are HWIO. Initializer
distributions intentionally match torch defaults so that training dynamics
are comparable to the reference:

- Conv2d / Linear: kaiming_uniform(a=sqrt(5)) on weights -> U(-1/sqrt(fan_in),
  1/sqrt(fan_in)); bias U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
- BatchNorm: gamma=1, beta=0, eps=1e-5, momentum=0.1, running_var unbiased.
- PReLU: single shared slope a=0.25 (reference uses nn.PReLU() everywhere,
  model_generator.py:11,34,48).
- LeakyReLU: slope 0.01 (torch default; reference model_discriminator.py:12).

All apply functions are pure; compute may be cast to a lower dtype
(bfloat16 on the MXU) while params/state stay fp32.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# Initializers (torch parity)
# ---------------------------------------------------------------------------


def _kaiming_uniform_bound(fan_in: int) -> float:
    # torch kaiming_uniform_(a=sqrt(5)): gain = sqrt(2/(1+a^2)) = sqrt(1/3)
    # bound = gain * sqrt(3/fan_in) = 1/sqrt(fan_in)
    return 1.0 / (fan_in ** 0.5)


def conv2d_init(key, kh: int, kw: int, c_in: int, c_out: int, dtype=jnp.float32):
    """Params for a conv: {'kernel': (kh, kw, c_in, c_out), 'bias': (c_out,)}"""
    k1, k2 = jax.random.split(key)
    fan_in = c_in * kh * kw
    b = _kaiming_uniform_bound(fan_in)
    kernel = jax.random.uniform(k1, (kh, kw, c_in, c_out), dtype, -b, b)
    bias = jax.random.uniform(k2, (c_out,), dtype, -b, b)
    return {"kernel": kernel, "bias": bias}


def space_to_depth2(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (row-phase,
    col-phase, c). H and W must be even."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _s2d_kernel_stride2(kernel):
    """3x3 stride-2 kernel (HWIO) -> equivalent 2x2 stride-1 kernel over the
    space-to-depth input: tap dy of the strided conv reads input row
    2y + dy - 1 = 2(y - 1 + a) + p with (a, p) = ((dy+1)//2, (dy+1)%2)."""
    c, o = kernel.shape[2], kernel.shape[3]
    w2 = jnp.zeros((2, 2, 2, 2, c, o), kernel.dtype)  # (a, b, p, q, c, o)
    for dy in range(3):
        a, p = (dy + 1) // 2, (dy + 1) % 2
        for dx in range(3):
            bb, q = (dx + 1) // 2, (dx + 1) % 2
            w2 = w2.at[a, bb, p, q].set(kernel[dy, dx])
    return w2.reshape(2, 2, 4 * c, o)


def _s2d_kernel_stride1_phases(kernel):
    """3x3 stride-1 kernel (HWIO) -> equivalent 3x3 kernel mapping a
    space-to-depth input directly to the space-to-depth OUTPUT (4x output
    channels, phase-packed). Output phase oy and tap dy read input row
    2y + oy + dy - 1 = 2(y - 1 + a) + p. Lets a stride-1 conv with tiny
    C_in (the D stem, C_in=3) run as a K=9*4C_in, N=4C_out matmul at half
    spatial size, and compose with the stride-2 s2d conv with no
    depth-to-space round trip."""
    c, o = kernel.shape[2], kernel.shape[3]
    w3 = jnp.zeros((3, 3, 2, 2, c, 2, 2, o), kernel.dtype)
    for oy in range(2):
        for dy in range(3):
            t = oy + dy - 1
            p = t % 2
            a = (t - p) // 2 + 1
            for ox in range(2):
                for dx in range(3):
                    s = ox + dx - 1
                    q = s % 2
                    bb = (s - q) // 2 + 1
                    w3 = w3.at[a, bb, p, q, :, oy, ox, :].set(kernel[dy, dx])
    return w3.reshape(3, 3, 4 * c, 4 * o)


def depth_to_space2_phases(x):
    """(B, H, W, 4C) phase-packed (row-phase, col-phase, c) -> (B, 2H, 2W, C).
    Inverse of space_to_depth2."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def conv2d_apply(params, x, *, stride: int = 1, padding: str | int = "SAME",
                 compute_dtype=None, kernel_override=None):
    """NHWC conv. `kernel_override` substitutes a (spectrally) normalized
    kernel while keeping the raw kernel as the trained parameter.

    (A space-to-depth lowering of stride-2 convs was measured SLOWER than
    XLA's native strided path in both directions on v5e —
    tools/bench_s2d_conv.py — so strided convs stay native here; the s2d
    helpers below serve only the discriminator's fused stem.)"""
    kernel = params["kernel"] if kernel_override is None else kernel_override
    bias = params["bias"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    # output dtype == compute dtype: the MXU still accumulates fp32
    # internally for bf16 operands, and keeping in/out dtypes equal is what
    # makes the conv transpose (backward pass) well-defined.
    y = lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(y.dtype)


def linear_init(key, d_in: int, d_out: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    b = _kaiming_uniform_bound(d_in)
    # stored as (d_in, d_out): right-multiplication, MXU friendly
    w = jax.random.uniform(k1, (d_in, d_out), dtype, -b, b)
    bias = jax.random.uniform(k2, (d_out,), dtype, -b, b)
    return {"kernel": w, "bias": bias}


def linear_apply(params, x, *, compute_dtype=None):
    w, bias = params["kernel"], params["bias"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w)
    return y + bias.astype(y.dtype)


# ---------------------------------------------------------------------------
# BatchNorm (explicit running-stat state; torch semantics)
# ---------------------------------------------------------------------------


def batchnorm_init(n_features: int, dtype=jnp.float32):
    params = {"scale": jnp.ones((n_features,), dtype),
              "bias": jnp.zeros((n_features,), dtype)}
    state = {"mean": jnp.zeros((n_features,), dtype),
             "var": jnp.ones((n_features,), dtype)}
    return params, state


def batchnorm_apply(params, state, x, *, train: bool,
                    momentum: float = 0.1, eps: float = 1e-5,
                    axis_name: Optional[str] = None):
    """BatchNorm2d over NHWC (stats over N,H,W).

    Train mode normalizes by biased batch variance and updates running stats
    with *unbiased* variance (torch semantics). When `axis_name` is given the
    batch statistics are additionally averaged across that mesh axis
    (cross-replica "sync BN" — our stated choice for the pjit data-parallel
    path; the reference's nn.DataParallel computes per-replica stats, an
    accident of its implementation rather than a design goal).
    """
    xf = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(xf, axis=(0, 1, 2))
        mean2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        if axis_name is not None:
            mean = lax.pmean(mean, axis_name)
            mean2 = lax.pmean(mean2, axis_name)
            n = n * lax.psum(1, axis_name)
        var = mean2 - jnp.square(mean)
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = lax.rsqrt(var + eps)
    y = (xf - mean) * inv * params["scale"] + params["bias"]
    return y.astype(x.dtype), new_state


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def prelu_init(dtype=jnp.float32):
    return {"alpha": jnp.asarray(0.25, dtype)}


def prelu_apply(params, x):
    a = params["alpha"].astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def leaky_relu(x, slope: float = 0.01):
    return jnp.where(x >= 0, x, slope * x)


# ---------------------------------------------------------------------------
# PixelShuffle (depth-to-space)
# ---------------------------------------------------------------------------


def pixel_shuffle(x, r: int):
    """Depth-to-space matching torch.nn.PixelShuffle channel ordering.

    Torch (NCHW) maps channel index c*r*r + i*r + j -> (c, row-offset i,
    col-offset j). In NHWC: (B, H, W, C*r*r) -> (B, H*r, W*r, C), with the
    input channel axis interpreted as (C, r, r).
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r, w, r, c
    return x.reshape(b, h * r, w * r, c)
