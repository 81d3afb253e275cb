"""Image quality metrics: PSNR and SSIM.

The reference has **no** quality metrics (explicit TODO, reference
README.md:88); BASELINE.md requires them to demonstrate CelebA x4 parity.
Both metrics operate on NHWC images in [-1, 1] (the framework's native
range) and convert to [0, 1] internally, matching the standard definitions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _to_unit(x):
    return (jnp.clip(x.astype(jnp.float32), -1.0, 1.0) + 1.0) / 2.0


def psnr(a, b, *, per_image: bool = False):
    """Peak signal-to-noise ratio in dB over [0,1]-scaled images."""
    a, b = _to_unit(a), _to_unit(b)
    axes = tuple(range(1, a.ndim))
    mse = jnp.mean(jnp.square(a - b), axis=axes)
    out = 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))
    return out if per_image else jnp.mean(out)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    g = np.exp(-0.5 * ((np.arange(size) - size // 2) / sigma) ** 2)
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def ssim(a, b, *, per_image: bool = False):
    """Structural similarity (Wang et al. 2004): 11x11 gaussian window,
    K1=0.01, K2=0.03, mean over channels and space.

    The window filters run at HIGHEST precision: TPU fp32 convs otherwise
    drop to bf16 MXU passes, and the variance-by-cancellation
    (E[x^2] - mu^2, true sigma^2 ~1e-3 for natural windows) gets swamped by
    ~1e-2 relative conv noise — denominators go negative and SSIM leaves
    [-1, 1] (observed: 1.64 on an on-chip eval)."""
    a, b = _to_unit(a), _to_unit(b)
    win = _gaussian_kernel()[:, :, None, None]  # HWIO, per-channel depthwise
    c = a.shape[-1]
    kernel = jnp.tile(win, (1, 1, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST)

    mu_a, mu_b = filt(a), filt(b)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    # clamp the cancellation residue: true variances are >= 0, and the
    # covariance obeys Cauchy-Schwarz |sig_ab| <= sqrt(sig_a*sig_b) — with
    # both enforced, per-window SSIM is mathematically bounded by 1 even
    # under independent rounding of the three filter outputs
    sig_a = jnp.maximum(filt(a * a) - mu_a2, 0.0)
    sig_b = jnp.maximum(filt(b * b) - mu_b2, 0.0)
    cs = jnp.sqrt(sig_a * sig_b)
    sig_ab = jnp.clip(filt(a * b) - mu_ab, -cs, cs)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    s = ((2 * mu_ab + c1) * (2 * sig_ab + c2)) / (
        (mu_a2 + mu_b2 + c1) * (sig_a + sig_b + c2))
    out = jnp.mean(s, axis=(1, 2, 3))
    return out if per_image else jnp.mean(out)
