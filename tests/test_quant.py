"""Int8 quantized serving path: correctness bounds vs the fp32 deploy
path, quantizer round-trip accuracy, and structural coverage of the
progressive (suffix-grown) tree."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sisr_tpu.config import GeneratorConfig
from sisr_tpu.infer import fold_generator, deploy_apply, make_deploy_fn
from sisr_tpu.models.generator import generator_init
from sisr_tpu.quant import (conv2d_q, deploy_apply_int8, make_deploy_fn_int8,
                            quantize_conv, quantize_deploy)


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * np.log10(4.0 / mse)  # range [-1, 1] -> peak 2


@pytest.fixture(scope="module")
def small_gen():
    cfg = GeneratorConfig(n_blocks=4, n_features_block=32,
                          n_features_last=64, list_scales=(2,))
    params, state = generator_init(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


def test_quantize_conv_roundtrip():
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 16, 32)) * 0.1
    q = quantize_conv({"kernel": k, "bias": jnp.zeros((32,))})
    assert q["q"].dtype == jnp.int8
    deq = q["q"].astype(jnp.float32) * q["scale"]
    # per-channel scale bounds the error by scale/2 elementwise
    err = jnp.abs(deq - k)
    assert float(jnp.max(err / q["scale"])) <= 0.5 + 1e-6


def test_conv2d_q_matches_fp32_conv():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 16, 16, 8))
    k = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 8, 16)) * 0.2
    bias = jax.random.normal(jax.random.PRNGKey(4), (16,)) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    got = conv2d_q(quantize_conv({"kernel": k, "bias": bias}), x, padding=1)
    # int8 weight+act: relative error ~1% of dynamic range
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) < 0.03 * scale


def test_int8_deploy_close_to_fp32_deploy(small_gen):
    cfg, params, state = small_gen
    fp, _ = fold_generator(params, state, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 12, 12, 3), minval=-1,
                          maxval=1)
    ref = deploy_apply(fp, x, cfg)
    got = deploy_apply_int8(quantize_deploy(fp), x, cfg)
    assert got.shape == ref.shape
    assert _psnr(got, ref) > 35.0  # quantization noise well below content


def test_int8_deploy_suffix_tree_and_keep_fp(small_gen):
    cfg, params, state = small_gen
    from sisr_tpu.models.generator import grow_suffix
    key = jax.random.PRNGKey(6)
    params2, state2 = grow_suffix(key, params, state, cfg)
    cfg2 = GeneratorConfig(**{**cfg.__dict__, "n_suffixes": 1})
    fp, _ = fold_generator(params2, state2, cfg2)
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 8, 8, 3), minval=-1,
                          maxval=1)
    ref = deploy_apply(fp, x, cfg2)
    for keep in [frozenset(), frozenset({"stem", "end", "upscale"})]:
        got = deploy_apply_int8(quantize_deploy(fp, keep_fp=keep), x, cfg2)
        assert got.shape == (1, 32, 32, 3)  # x4: 2 (list_scales) * 2 (suffix)
        assert _psnr(got, ref) > 35.0


def test_int8_sharded_serving_matches_single(small_gen):
    """int8 deploy composes with batch-parallel serving: the dynamic
    per-tensor activation amax becomes a cross-device max collective under
    GSPMD, so the sharded output must match single-device exactly."""
    from sisr_tpu.infer import fold_generator
    from sisr_tpu.parallel import make_mesh, shard_batch, shard_infer_fn

    cfg, params, state = small_gen
    fp, _ = fold_generator(params, state, cfg)
    qp = quantize_deploy(fp)
    fn = lambda x: deploy_apply_int8(qp, x, cfg)  # noqa: E731

    x = jax.random.uniform(jax.random.PRNGKey(8), (8, 12, 12, 3), minval=-1,
                          maxval=1)
    y1 = jax.jit(fn)(x)
    mesh = make_mesh()
    y8 = shard_infer_fn(fn, mesh)(shard_batch(mesh, x))
    np.testing.assert_allclose(np.asarray(y8), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)


def test_int8_tiled_sr(small_gen):
    """int8 deploy composes with halo tiling. Per-tile dynamic activation
    scales differ slightly from the whole-image scale, so the contract is
    quantization-noise closeness (not the fp path's exactness)."""
    from sisr_tpu.infer import tiled_sr

    cfg, params, state = small_gen
    fwd_q = make_deploy_fn_int8(params, state, cfg)
    img = np.asarray(jax.random.uniform(jax.random.PRNGKey(9), (72, 56, 3),
                                        minval=-1, maxval=1))
    direct = np.asarray(fwd_q(jnp.asarray(img)[None]))[0]
    tiled = tiled_sr(params, state, img, cfg, tile=48, tile_batch=4,
                     fwd=lambda p, s, x: fwd_q(x))
    assert tiled.shape == direct.shape
    assert _psnr(tiled, direct) > 35.0


def test_make_deploy_fn_int8_jits(small_gen):
    cfg, params, state = small_gen
    fwd = make_deploy_fn_int8(params, state, cfg)
    x = jnp.zeros((1, 8, 8, 3))
    y = fwd(x)
    assert y.shape == (1, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(y)))
