"""Bicubic LR-from-HR synthesis, TPU-native.

The reference derives every LR training batch on the fly:
bicubic `F.interpolate(..., mode='bicubic', align_corners=True)` then clamp
to [-1, 1] (reference utils.py:16-31). The interpolation provably overshoots
the range (utils.py:33-47), so the clamp is semantic, not cosmetic — it
defines the LR distribution the models are trained on.

TPU design: instead of a gather-based kernel (poor fit for the VPU), the
separable bicubic is expressed as two dense matrix products
    LR = A_h @ HR @ A_w^T        (per batch/channel)
with A_* precomputed (out, in) tap matrices. The contraction runs on the MXU
and XLA fuses the clamp into the epilogue. Tap weights replicate PyTorch's
cubic convolution (A = -0.75, align_corners=True, replicate-clamped borders)
bit-for-bit in fp32 — verified against torch in tests/test_resize.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_A = -0.75  # torch's cubic coefficient (Keys, same as OpenCV)


def _cubic(t: np.ndarray) -> np.ndarray:
    t = np.abs(t)
    t2, t3 = t * t, t * t * t
    w = np.where(
        t <= 1.0,
        (_A + 2.0) * t3 - (_A + 3.0) * t2 + 1.0,
        np.where(t < 2.0, _A * t3 - 5.0 * _A * t2 + 8.0 * _A * t - 4.0 * _A, 0.0),
    )
    return w


@functools.lru_cache(maxsize=64)
def _weight_matrix_np(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bicubic resampling matrix, align_corners=True."""
    m = np.zeros((n_out, n_in), dtype=np.float64)
    if n_out == 1:
        scale = 0.0
    else:
        scale = (n_in - 1) / (n_out - 1)
    for o in range(n_out):
        x = o * scale
        x0 = int(np.floor(x))
        t = x - x0
        taps = [x0 - 1, x0, x0 + 1, x0 + 2]
        ws = _cubic(np.array([1.0 + t, t, 1.0 - t, 2.0 - t]))
        for idx, w in zip(taps, ws):
            m[o, min(max(idx, 0), n_in - 1)] += w
    return m.astype(np.float32)


def bicubic_weight_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    return jnp.asarray(_weight_matrix_np(n_in, n_out))


def bicubic_resize(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bicubic resize of NHWC `x` to (out_h, out_w), align_corners=True.

    Two MXU contractions; fp32 accumulation regardless of input dtype.
    """
    out_h, out_w = out_hw
    b, h, w, c = x.shape
    ah = bicubic_weight_matrix(h, out_h)
    aw = bicubic_weight_matrix(w, out_w)
    xf = x.astype(jnp.float32)
    # HIGHEST precision: tap weights are exact fp32; the LR distribution is a
    # training-semantics contract, so no bf16 shortcut here (this op is a
    # vanishing fraction of step FLOPs).
    hi = jax.lax.Precision.HIGHEST
    # rows: (oh, h) x (b, h, w, c) -> (b, oh, w, c)
    y = jnp.einsum("oh,bhwc->bowc", ah, xf, precision=hi,
                   preferred_element_type=jnp.float32)
    # cols: (ow, w) x (b, oh, w, c) -> (b, oh, ow, c)
    y = jnp.einsum("pw,bowc->bopc", aw, y, precision=hi,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def lr_from_hr(img_hr: jnp.ndarray, lr_hw) -> jnp.ndarray:
    """Reference utils.py:22-31: bicubic downsample then clamp to [-1, 1]."""
    lr = bicubic_resize(img_hr, lr_hw)
    return jnp.clip(lr, -1.0, 1.0)


def device_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> fp32 [-1,1] with the exact expression the host
    pipeline uses (np.float32(x)/255 * 2 - 1 — data/pipeline.py
    ImageFolderDataset/MNISTDataset), so moving normalization on-device
    (uint8 transport: 4x less h2d than fp32, and 4x less of the relay's
    per-upload retention, BENCH_NOTES round 5) reproduces the same pixel
    values. Float inputs pass through unchanged (already normalized)."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        return x.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    return x
