"""Pallas kernel parity tests (interpret mode on CPU; real lowering is
exercised on-device by the verify drives and bench)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sisr_tpu.nn.layers import conv2d_apply, pixel_shuffle, prelu_apply
from sisr_tpu.ops.pallas.bicubic import bicubic_clamp_pallas
from sisr_tpu.ops.pallas.fused_upscale import fused_conv_shuffle_prelu
from sisr_tpu.ops.resize import lr_from_hr


def test_fused_upscale_matches_unfused(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 16, 32)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(32).astype(np.float32) * 0.1)
    alpha = 0.25
    ref = conv2d_apply({"kernel": k, "bias": b}, x, padding=1)
    ref = pixel_shuffle(ref, 2)
    ref = prelu_apply({"alpha": jnp.asarray(alpha)}, ref)
    out = fused_conv_shuffle_prelu(x, k, b, alpha, interpret=True)
    assert out.shape == (2, 16, 16, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((32, 32), (8, 8)),
                                          ((16, 24), (8, 6))])
def test_bicubic_pallas_matches_xla(rng, in_hw, out_hw):
    x = jnp.asarray(rng.uniform(-1.5, 1.5, (2, *in_hw, 3)).astype(np.float32))
    ref = lr_from_hr(x, out_hw)
    out = bicubic_clamp_pallas(x, out_hw, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0
