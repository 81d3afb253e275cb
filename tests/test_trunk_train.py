"""Training-trunk pallas kernel: forward parity + custom-VJP gradient parity
vs the pure-JAX reference (interpret mode; device path exercised on TPU by
tools/bench_trunk_train.py and the train integration test below)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sisr_tpu.ops.pallas.trunk_train import (
    make_trunk_train,
    pack_trunk_weights,
    rotate_io,
    trunk_train_ref,
)

B, H, W, NF, NBLK = 2, 8, 8, 8, 2
L = 2 * NBLK + 1


def _args(seed=0):
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.normal(0, 1, (B, H, W, NF)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (L, 9 * NF, NF)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (L, NF)).astype(np.float32))
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, (L, NF)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.1, (L, NF)).astype(np.float32))
    alpha = jnp.asarray(rng.uniform(0.1, 0.4, (NBLK,)).astype(np.float32))
    return x0, w, b, gamma, beta, alpha


def test_rotate_io_is_conv_transpose():
    """conv(dy, rotate_io(w)) must equal the autodiff data gradient."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, NF)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (1, 9 * NF, NF)).astype(np.float32))
    g = jnp.asarray(rng.normal(0, 1, (B, H, W, NF)).astype(np.float32))

    from sisr_tpu.ops.pallas.trunk_train import _conv9_ref
    dx_ad = jax.grad(
        lambda xx: jnp.sum(_conv9_ref(xx, w[0], jnp.float32) * g))(x)
    dx_rot = _conv9_ref(g, rotate_io(w)[0], jnp.float32)
    np.testing.assert_allclose(np.asarray(dx_rot), np.asarray(dx_ad),
                               rtol=1e-4, atol=1e-4)


def test_trunk_train_forward_interpret():
    args = _args()
    trunk = make_trunk_train(NBLK, interpret=True, compute_dtype=jnp.float32)
    out, mu, var = trunk(*args)
    out_r, mu_r, var_r = trunk_train_ref(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_r),
                               rtol=1e-4, atol=1e-5)


def test_trunk_train_grads_interpret():
    args = _args(2)
    rng = np.random.default_rng(3)
    cot = jnp.asarray(rng.normal(0, 1, (B, H, W, NF)).astype(np.float32))
    trunk = make_trunk_train(NBLK, interpret=True, compute_dtype=jnp.float32)

    def loss_k(*a):
        out, _, _ = trunk(*a)
        return jnp.sum(out * cot)

    def loss_r(*a):
        out, _, _ = trunk_train_ref(*a)
        return jnp.sum(out * cot)

    gk = jax.grad(loss_k, argnums=tuple(range(6)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(6)))(*args)
    names = ["dx0", "dw", "dbias", "dgamma", "dbeta", "dalpha"]
    for n, a, b in zip(names, gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=n)


def test_generator_fused_trunk_train_matches_unfused():
    """generator_apply(fused_trunk=True) == the per-layer path: output and
    the BN/SN state updates."""
    from sisr_tpu.config import GeneratorConfig
    from sisr_tpu.models.generator import generator_apply, generator_init

    gcfg = GeneratorConfig(n_blocks=2, n_features_block=8, n_features_last=16)
    gcfg_f = GeneratorConfig(n_blocks=2, n_features_block=8,
                             n_features_last=16, fused_trunk=True)
    params, state = generator_init(jax.random.PRNGKey(0), gcfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32))

    y_ref, ns_ref = generator_apply(params, state, x, train=True, cfg=gcfg)
    y_fus, ns_fus = generator_apply(params, state, x, train=True, cfg=gcfg_f)
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    ref_leaves = jax.tree_util.tree_leaves_with_path(ns_ref)
    fus_flat = dict(jax.tree_util.tree_leaves_with_path(ns_fus))
    assert len(ref_leaves) == len(fus_flat)
    for path, leaf in ref_leaves:
        np.testing.assert_allclose(np.asarray(fus_flat[path]),
                                   np.asarray(leaf), rtol=1e-4, atol=1e-5,
                                   err_msg=str(path))


def test_generator_fused_trunk_grads_match():
    from sisr_tpu.config import GeneratorConfig
    from sisr_tpu.models.generator import generator_apply, generator_init

    gcfg = GeneratorConfig(n_blocks=2, n_features_block=8, n_features_last=16)
    gcfg_f = GeneratorConfig(n_blocks=2, n_features_block=8,
                             n_features_last=16, fused_trunk=True)
    params, state = generator_init(jax.random.PRNGKey(0), gcfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))

    def loss(p, cfg):
        y, _ = generator_apply(p, state, x, train=True, cfg=cfg)
        return jnp.mean((y - tgt) ** 2)

    g_ref = jax.grad(loss)(params, gcfg)
    g_fus = jax.grad(loss)(params, gcfg_f)
    ref_leaves = jax.tree_util.tree_leaves_with_path(g_ref)
    fus_flat = dict(jax.tree_util.tree_leaves_with_path(g_fus))
    for path, leaf in ref_leaves:
        np.testing.assert_allclose(np.asarray(fus_flat[path]),
                                   np.asarray(leaf), rtol=2e-3, atol=1e-5,
                                   err_msg=str(path))
