"""Image quality metrics: PSNR, SSIM, and perceptual/sharpness metrics.

The reference has **no** quality metrics (explicit TODO, reference
README.md:88); BASELINE.md requires them to demonstrate CelebA x4 parity.
All metrics operate on NHWC images in [-1, 1] (the framework's native
range) and convert to [0, 1] internally, matching the standard definitions.

PSNR/SSIM alone cannot show what the reference's adversarial recipe buys:
its report (§IV) claims the GAN gives "bien meilleure qualité" — sharper
textures — which is exactly what distortion metrics penalize (the
perception-distortion tradeoff, Blau & Michaeli 2018). `grad_ratio` and
`gmsd` quantify that axis without any pretrained network (zero egress):
an MSE-trained SR net is systematically blurrier than HR (grad_ratio < 1);
a working adversarial finetune moves grad_ratio toward 1 at a small PSNR
cost.
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


def _luma(x):
    """[0,1] luminance plane (BT.601 for 3-channel; identity for 1)."""
    x = _to_unit(x)
    if x.shape[-1] == 3:
        w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
        return jnp.einsum("bhwc,c->bhw", x, w)[..., None]
    return x


def _grad_mag(x):
    """Prewitt gradient magnitude of the luminance plane (VALID window)."""
    px = jnp.asarray([[1, 0, -1]] * 3, jnp.float32) / 3.0
    k = jnp.stack([px, px.T], axis=-1)[:, :, None, :]  # HWIO, I=1, O=2
    g = jax.lax.conv_general_dilated(
        _luma(x), k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return jnp.sqrt(jnp.sum(jnp.square(g), axis=-1) + 1e-12)


def grad_ratio(sr, hr, *, per_image: bool = False):
    """Edge-sharpness ratio: mean|grad SR| / mean|grad HR|.

    1.0 = the SR image carries the same edge energy as the ground truth;
    <1 = blurrier (the MSE-training signature); >1 = over-sharpened /
    haloed. The perceptual axis PSNR cannot see (VERDICT r4 next #4)."""
    axes = (1, 2)
    r = (jnp.mean(_grad_mag(sr), axis=axes)
         / jnp.maximum(jnp.mean(_grad_mag(hr), axis=axes), 1e-8))
    return r if per_image else jnp.mean(r)


def gmsd(sr, hr, *, per_image: bool = False, c: float = 0.0026):
    """Gradient Magnitude Similarity Deviation (Xue et al. 2013).

    Std-dev over the image of the per-pixel gradient-magnitude similarity
    map (2*g1*g2 + c) / (g1^2 + g2^2 + c). Lower is better (0 = identical
    edge structure). `c` is the published constant for [0,1]-range images
    (170/255^2). A structure-aware perceptual metric needing no pretrained
    weights."""
    g1, g2 = _grad_mag(sr), _grad_mag(hr)
    gms = (2.0 * g1 * g2 + c) / (g1 * g1 + g2 * g2 + c)
    mu = jnp.mean(gms, axis=(1, 2), keepdims=True)
    out = jnp.sqrt(jnp.mean(jnp.square(gms - mu), axis=(1, 2)))
    return out if per_image else jnp.mean(out)


def hf_energy_ratio(sr, hr, *, per_image: bool = False):
    """High-frequency (Laplacian) energy ratio vs ground truth.

    mean(lap(SR)^2) / mean(lap(HR)^2): texture-energy recovery. MSE models
    sit well below 1; adversarial finetunes close the gap."""
    lap = jnp.asarray([[0, 1, 0], [1, -4, 1], [0, 1, 0]],
                      jnp.float32)[:, :, None, None]

    def e(x):
        y = jax.lax.conv_general_dilated(
            _luma(x), lap, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        return jnp.mean(jnp.square(y), axis=(1, 2, 3))

    r = e(sr) / jnp.maximum(e(hr), 1e-10)
    return r if per_image else jnp.mean(r)
