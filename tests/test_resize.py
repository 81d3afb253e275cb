"""Bicubic LR-synthesis parity vs torch (reference utils.py:16-47).

The clamp-after-overshoot behavior defines the training LR distribution
(SURVEY.md §7 'hard parts'), so these tests are bit-level strict.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sisr_tpu.ops.resize import bicubic_resize, lr_from_hr


def _torch_bicubic(x_nhwc, out_hw):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    y = F.interpolate(t, out_hw, mode="bicubic", align_corners=True)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("in_hw,out_hw", [
    ((128, 128), (32, 32)),   # celeba x4
    ((64, 64), (32, 32)),     # x2
    ((256, 256), (32, 32)),   # x8
    ((28, 28), (14, 14)),     # mnist x2
    ((33, 47), (12, 9)),      # odd sizes
    ((8, 8), (16, 16)),       # upscaling also supported
])
def test_bicubic_parity_vs_torch(rng, in_hw, out_hw):
    x = rng.uniform(-1, 1, (2, *in_hw, 3)).astype(np.float32)
    ours = np.asarray(bicubic_resize(jnp.asarray(x), out_hw))
    ref = _torch_bicubic(x, out_hw)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=5e-5)


def test_lr_overshoots_then_clamps(rng):
    # interpolation provably leaves [-1, 1] (reference utils.py:33-39)
    max_val = 0.0
    for _ in range(200):
        x = rng.uniform(-1, 1, (1, 8, 8, 1)).astype(np.float32)
        y = np.asarray(bicubic_resize(jnp.asarray(x), (4, 4)))
        max_val = max(max_val, float(np.abs(y).max()))
    assert max_val > 1.1

    x = rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
    y = np.asarray(lr_from_hr(jnp.asarray(x), (8, 8)))
    assert y.min() >= -1.0 and y.max() <= 1.0
    # clamp is identity where in range (reference utils.py:41-47)
    raw = np.asarray(bicubic_resize(jnp.asarray(x), (8, 8)))
    inside = np.abs(raw) <= 1.0
    np.testing.assert_array_equal(y[inside], raw[inside])


def test_lr_from_hr_matches_reference_pipeline(rng):
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(lr_from_hr(jnp.asarray(x), (16, 16)))
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = F.interpolate(t, (16, 16), mode="bicubic", align_corners=True)
    ref = torch.clamp(ref, -1.0, 1.0).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=5e-5)
