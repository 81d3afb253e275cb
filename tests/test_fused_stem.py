"""Fused D-stem pallas kernel (l0+l1 in s2d space): forward parity +
custom-VJP gradient parity vs the pure-JAX reference (interpret mode; the
device path is exercised on TPU by tools/bench_fused_stem.py), plus the
vmap composition the 12-slot D update relies on and integration with
discriminator_apply."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sisr_tpu.ops.pallas.fused_stem import fused_stem_ref, make_fused_stem

B, H, W = 4, 8, 8
CI, CM, CO = 12, 16, 4   # s2d channels: 4*3 in; 4*nf mid; nf out
SLOPE = 0.01


def _args(seed=0):
    rng = np.random.default_rng(seed)
    xs = jnp.asarray(rng.normal(0, 1, (B, H, W, CI)).astype(np.float32))
    wa = jnp.asarray(rng.normal(0, 0.2, (3, 3, CI, CM)).astype(np.float32))
    ba = jnp.asarray(rng.normal(0, 0.1, (CM,)).astype(np.float32))
    wb = jnp.asarray(rng.normal(0, 0.2, (2, 2, CM, CO)).astype(np.float32))
    bb = jnp.asarray(rng.normal(0, 0.1, (CO,)).astype(np.float32))
    return xs, wa, ba, wb, bb


def test_forward_interpret():
    args = _args()
    f = make_fused_stem(interpret=True, compute_dtype=jnp.float32,
                        slope=SLOPE)
    out = f(*args)
    ref = fused_stem_ref(*args, compute_dtype=jnp.float32, slope=SLOPE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grads_interpret():
    args = _args(1)
    f = make_fused_stem(interpret=True, compute_dtype=jnp.float32,
                        slope=SLOPE)
    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.normal(0, 1, (B, H, W, CO)).astype(np.float32))

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) * g)

    ref_fn = lambda *a: fused_stem_ref(   # noqa: E731
        *a, compute_dtype=jnp.float32, slope=SLOPE)
    grads = jax.grad(loss(f), argnums=(0, 1, 2, 3, 4))(*args)
    grads_r = jax.grad(loss(ref_fn), argnums=(0, 1, 2, 3, 4))(*args)
    for gp, gr, name in zip(grads, grads_r, ("dxs", "dwa", "dba", "dwb",
                                             "dbb")):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_padded_variant_exact_interpret():
    """make_fused_stem_padded (C_in zero-padded to 16 lanes for aligned
    patch assembly) is exact vs the unpadded kernel — forward AND all five
    gradients (dxs sliced back through jnp.pad's vjp)."""
    from sisr_tpu.ops.pallas.fused_stem import make_fused_stem_padded

    args = _args(3)
    f = make_fused_stem(interpret=True, compute_dtype=jnp.float32,
                        slope=SLOPE)
    fp = make_fused_stem_padded(interpret=True, compute_dtype=jnp.float32,
                                slope=SLOPE)
    np.testing.assert_allclose(np.asarray(fp(*args)), np.asarray(f(*args)),
                               rtol=1e-6, atol=1e-6)

    rng = np.random.default_rng(4)
    g = jnp.asarray(rng.normal(0, 1, (B, H, W, CO)).astype(np.float32))

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) * g)

    for gp, gr, name in zip(
            jax.grad(loss(fp), argnums=(0, 1, 2, 3, 4))(*args),
            jax.grad(loss(f), argnums=(0, 1, 2, 3, 4))(*args),
            ("dxs", "dwa", "dba", "dwb", "dbb")):
        assert gp.shape == gr.shape, name
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_vmap_interpret():
    """The D update vmaps discriminator_apply over 12 slots; the pallas op
    must batch correctly (fwd and bwd)."""
    S = 3
    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.normal(0, 1, (S, B, H, W, CI)).astype(np.float32))
    _, wa, ba, wb, bb = _args(4)
    f = make_fused_stem(interpret=True, compute_dtype=jnp.float32,
                        slope=SLOPE)

    def loss(w, x):
        out = jax.vmap(lambda xb: f(xb, w, ba, wb, bb))(x)
        return jnp.sum(out * out)

    def loss_ref(w, x):
        out = jax.vmap(lambda xb: fused_stem_ref(
            xb, w, ba, wb, bb, compute_dtype=jnp.float32, slope=SLOPE))(x)
        return jnp.sum(out * out)

    v, dw = jax.value_and_grad(loss)(wa, xs)
    v_r, dw_r = jax.value_and_grad(loss_ref)(wa, xs)
    np.testing.assert_allclose(float(v), float(v_r), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_r),
                               rtol=1e-4, atol=1e-4)


def test_matches_discriminator_fused_region():
    """The kernel + s2d packing must reproduce the discriminator's existing
    fused-stem region (stem conv + lrelu + block0 conv, pre-BN) including
    gradients through the packing functions."""
    from jax import lax
    from sisr_tpu.nn.layers import (
        _s2d_kernel_stride1_phases,
        _s2d_kernel_stride2,
        space_to_depth2,
    )

    nf = 6
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 3)).astype(np.float32))
    k_stem = jnp.asarray(rng.normal(0, 0.2, (3, 3, 3, nf))
                         .astype(np.float32))
    b_stem = jnp.asarray(rng.normal(0, 0.1, (nf,)).astype(np.float32))
    k0 = jnp.asarray(rng.normal(0, 0.2, (3, 3, nf, nf)).astype(np.float32))
    b0 = jnp.asarray(rng.normal(0, 0.1, (nf,)).astype(np.float32))

    def region_xla(k_stem, k0):
        """discriminator.py's FUSE_STEM region verbatim (pre-BN)."""
        xs = space_to_depth2(x)
        y = lax.conv_general_dilated(
            xs, _s2d_kernel_stride1_phases(k_stem), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + jnp.tile(b_stem, 4)
        y = jnp.where(y >= 0, y, SLOPE * y)
        y = lax.conv_general_dilated(
            y, _s2d_kernel_stride2(k0), (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b0

    f = make_fused_stem(interpret=True, compute_dtype=jnp.float32,
                        slope=SLOPE)

    def region_pallas(k_stem, k0):
        return f(space_to_depth2(x), _s2d_kernel_stride1_phases(k_stem),
                 jnp.tile(b_stem, 4), _s2d_kernel_stride2(k0)
                 .reshape(2, 2, 4 * nf, nf), b0)

    out_x = region_xla(k_stem, k0)
    out_p = region_pallas(k_stem, k0)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-4, atol=1e-4)

    g = jnp.asarray(np.random.default_rng(6).normal(
        0, 1, out_x.shape).astype(np.float32))
    gx = jax.grad(lambda a, b: jnp.sum(region_xla(a, b) * g),
                  argnums=(0, 1))(k_stem, k0)
    gp = jax.grad(lambda a, b: jnp.sum(region_pallas(a, b) * g),
                  argnums=(0, 1))(k_stem, k0)
    for a, b, name in zip(gp, gx, ("dk_stem", "dk0")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_discriminator_apply_pallas_stem_parity():
    """discriminator_apply with PALLAS_STEM on must match the XLA fused
    path end to end (logits + param grads), fp32 on CPU interpret."""
    import dataclasses

    import sisr_tpu.models.discriminator as D
    from sisr_tpu.config import DiscriminatorConfig
    from sisr_tpu.models.discriminator import (
        discriminator_apply,
        discriminator_init,
    )

    dcfg = DiscriminatorConfig(input_shape=(3, 16, 16),
                               list_n_features=(8, 8, 16),
                               list_stride=(1, 2, 2))
    params, state = discriminator_init(jax.random.PRNGKey(0), dcfg)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32))

    def logits_loss(params, use_pallas):
        D.PALLAS_STEM = use_pallas
        D._PALLAS_INTERPRET = use_pallas
        try:
            out, _ = discriminator_apply(params, state, x, train=True,
                                         cfg=dcfg,
                                         compute_dtype=jnp.float32,
                                         return_logits=True)
        finally:
            D.PALLAS_STEM = False
            D._PALLAS_INTERPRET = False
        return jnp.sum(out ** 2)

    v_x, g_x = jax.value_and_grad(lambda p: logits_loss(p, False))(params)
    v_p, g_p = jax.value_and_grad(lambda p: logits_loss(p, True))(params)
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-5)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g_p),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(g_x),
                   key=lambda t: str(t[0]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=str(ka))
