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


def test_fused_trunk_matches_folded_xla(rng):
    from sisr_tpu.config import GeneratorConfig
    from sisr_tpu.infer import fold_generator
    from sisr_tpu.models.generator import generator_init
    from sisr_tpu.ops.pallas.trunk import fused_trunk
    from sisr_tpu.nn.layers import conv2d_apply

    gcfg = GeneratorConfig(n_blocks=3, n_features_block=8,
                           n_features_last=16, use_sn=True)
    p, s = generator_init(jax.random.PRNGKey(0), gcfg)
    fp, _ = fold_generator(p, s, gcfg)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 6, 6, 8)).astype(np.float32))

    h = x
    for bp in fp["blocks"]:
        y = conv2d_apply(bp["conv1"], h, padding=1)
        y = prelu_apply(bp["prelu"], y)
        y = conv2d_apply(bp["conv2"], y, padding=1)
        h = h + y
    ref = conv2d_apply(fp["block_end"]["conv"], h, padding=1) + x
    out = fused_trunk(x, fp, interpret=True)
    # trunk kernel computes its dots in bf16 (MXU layout) -> bf16-level tol
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_deploy_apply_matches_eval_forward(rng):
    """Whole deploy pipeline (folded, with pallas kernels in interpret mode)
    == eval-mode generator_apply."""
    from sisr_tpu.config import GeneratorConfig
    from sisr_tpu.infer import fold_generator, deploy_apply
    from sisr_tpu.models.generator import generator_apply, generator_init

    gcfg = GeneratorConfig(n_blocks=2, n_features_block=8,
                           n_features_last=16, use_sn=True, n_suffixes=1)
    p, s = generator_init(jax.random.PRNGKey(0), gcfg)
    fp, _ = fold_generator(p, s, gcfg)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32))
    ref, _ = generator_apply(p, s, x, train=False, cfg=gcfg)
    for pallas, tol in ((False, 1e-4), (True, 2e-2)):
        out = deploy_apply(fp, x, gcfg, use_pallas_trunk=pallas,
                           use_pallas_upscale=pallas, interpret=True)
        assert out.shape == (2, 32, 32, 3)
        # pallas trunk runs bf16 dots -> bf16-level tolerance
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=tol, atol=tol,
                                   err_msg=f"pallas={pallas}")


def test_fused_trunk_tiled_matches_v1(rng):
    """The v2 batch-tiled/bf16-buffer trunk schedule must agree with both
    the per-image v1 kernel and the folded XLA trunk (bf16-level tol —
    the XLA deploy path itself carries bf16 activations between convs)."""
    from sisr_tpu.config import GeneratorConfig
    from sisr_tpu.infer import fold_generator
    from sisr_tpu.models.generator import generator_init
    from sisr_tpu.ops.pallas.trunk import fused_trunk
    from sisr_tpu.nn.layers import conv2d_apply

    gcfg = GeneratorConfig(n_blocks=3, n_features_block=8,
                           n_features_last=16, use_sn=True)
    p, s = generator_init(jax.random.PRNGKey(0), gcfg)
    fp, _ = fold_generator(p, s, gcfg)
    x = jnp.asarray(rng.uniform(-1, 1, (4, 6, 6, 8)).astype(np.float32))

    h = x
    for bp in fp["blocks"]:
        y = conv2d_apply(bp["conv1"], h, padding=1)
        y = prelu_apply(bp["prelu"], y)
        y = conv2d_apply(bp["conv2"], y, padding=1)
        h = h + y
    ref = conv2d_apply(fp["block_end"]["conv"], h, padding=1) + x

    v1 = fused_trunk(x, fp, tile_b=1, interpret=True)
    for t in (2, 4, 0):  # explicit tiles + auto-pick
        v2 = fused_trunk(x, fp, tile_b=t, interpret=True)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                                   rtol=2e-2, atol=2e-2)
