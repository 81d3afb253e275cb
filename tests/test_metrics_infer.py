"""PSNR/SSIM correctness + tiled-inference equivalence + viz smoke."""
import numpy as np

import jax
import jax.numpy as jnp

from sisr_tpu.config import GeneratorConfig
from sisr_tpu.infer import make_sr_fn, tiled_sr
from sisr_tpu.metrics import psnr, ssim
from sisr_tpu.models.generator import generator_init
from sisr_tpu.viz import make_grid, save_comparison_figure, save_loss_curves


def test_psnr_basics(rng):
    a = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    assert float(psnr(a, a)) > 100  # identical
    b = jnp.clip(a + 0.2, -1, 1)
    v = float(psnr(a, b))
    assert 10 < v < 25
    # known value: constant MSE in [0,1] space
    x = jnp.zeros((1, 8, 8, 1))
    y = jnp.full((1, 8, 8, 1), -0.2)  # unit-space diff 0.1 -> mse 0.01
    np.testing.assert_allclose(float(psnr(x, y)), 20.0, atol=1e-3)


def test_ssim_basics(rng):
    a = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    assert float(ssim(a, a)) > 0.999
    noise = jnp.asarray(rng.normal(0, 0.5, a.shape).astype(np.float32))
    assert float(ssim(a, jnp.clip(a + noise, -1, 1))) < 0.85


def test_ssim_bounded(rng):
    """SSIM must stay in [-1, 1] (an on-chip eval once reported 1.64: TPU
    fp32 convs default to bf16 passes, and the cancellation noise swamped
    the window variances — fixed with HIGHEST-precision filters + a
    variance clamp). Flat regions are the numerically worst case."""
    flat = jnp.full((2, 48, 48, 3), 0.31)
    tex = jnp.asarray(rng.uniform(-1, 1, (2, 48, 48, 3)).astype(np.float32))
    half = jnp.concatenate([flat[:, :24], tex[:, :24]], axis=1)
    for a, b in [(flat, flat), (flat, tex), (half, tex), (half, half)]:
        v = float(ssim(a, b))
        assert -1.0 <= v <= 1.0 + 1e-6, v


def test_ssim_matches_torch_impl(rng):
    """Cross-check against an independent torch implementation of the same
    standard formula."""
    import torch
    import torch.nn.functional as F

    a = rng.uniform(-1, 1, (1, 24, 24, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), -1, 1).astype(np.float32)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))

    g = np.exp(-0.5 * ((np.arange(11) - 5) / 1.5) ** 2)
    g /= g.sum()
    win = torch.tensor(np.outer(g, g), dtype=torch.float32)[None, None].repeat(3, 1, 1, 1)
    ta = (torch.from_numpy(a).permute(0, 3, 1, 2) + 1) / 2
    tb = (torch.from_numpy(b).permute(0, 3, 1, 2) + 1) / 2
    mu_a = F.conv2d(ta, win, groups=3)
    mu_b = F.conv2d(tb, win, groups=3)
    sa = F.conv2d(ta * ta, win, groups=3) - mu_a ** 2
    sb = F.conv2d(tb * tb, win, groups=3) - mu_b ** 2
    sab = F.conv2d(ta * tb, win, groups=3) - mu_a * mu_b
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * sab + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (sa + sb + c2))
    np.testing.assert_allclose(ours, float(s.mean()), rtol=1e-4)


def test_tiled_sr_matches_direct(rng):
    """Halo-tiled SR must match full-image SR away from nothing — the halo
    covers the receptive field, so everywhere (loose fp tolerance)."""
    gen_cfg = GeneratorConfig(n_blocks=2, n_features_block=8,
                              n_features_last=16)
    params, state = generator_init(jax.random.PRNGKey(0), gen_cfg)
    img = rng.uniform(-1, 1, (48, 40, 3)).astype(np.float32)

    fwd = make_sr_fn(gen_cfg, batch_stats=False)
    direct = np.asarray(fwd(params, state, jnp.asarray(img[None])))[0]
    tiled = tiled_sr(params, state, img, gen_cfg, tile=32, tile_batch=4)
    assert tiled.shape == direct.shape == (96, 80, 3)
    # valid-region tiling with margin >= receptive field is exact up to fp
    np.testing.assert_allclose(tiled, direct, atol=1e-5)


def test_make_grid_and_figures(tmp_path, rng):
    imgs = rng.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
    grid = make_grid(imgs, nrow=2)
    assert grid.shape == (16, 16, 3)
    assert grid.min() >= 0 and grid.max() <= 1

    out = save_loss_curves({"G": [1, 2], "D": [2, 1], "cont": [3]},
                           str(tmp_path / "run"))
    assert out and out.endswith(".png")
    out = save_comparison_figure([("LR", imgs[0]), ("SR", imgs[1])],
                                 str(tmp_path / "cmp"))
    assert out and out.endswith(".png")


def test_fold_generator_matches_eval(rng):
    """Deploy-mode folding (SN sigma + BN constants into conv weights) must
    reproduce eval-mode inference exactly."""
    from sisr_tpu.infer import fold_generator

    gen_cfg = GeneratorConfig(n_blocks=2, n_features_block=8,
                              n_features_last=16, use_sn=True, n_suffixes=1)
    params, state = generator_init(jax.random.PRNGKey(0), gen_cfg)
    fp, fs = fold_generator(params, state, gen_cfg)

    from sisr_tpu.models.generator import generator_apply
    x = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32))
    y_ref, _ = generator_apply(params, state, x, train=False, cfg=gen_cfg)
    y_fold, _ = generator_apply(fp, fs, x, train=False, cfg=gen_cfg)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


def test_tiled_sr_with_deploy_override(rng):
    """--tiled --deploy composition: a folded deploy fn passed as `fwd`
    must reproduce the eval-mode tiled result (both use running stats)."""
    from sisr_tpu.infer import make_deploy_fn

    gen_cfg = GeneratorConfig(n_blocks=2, n_features_block=8,
                              n_features_last=16)
    params, state = generator_init(jax.random.PRNGKey(0), gen_cfg)
    img = rng.uniform(-1, 1, (48, 40, 3)).astype(np.float32)

    tiled_eval = tiled_sr(params, state, img, gen_cfg, tile=32, tile_batch=4)
    deploy = make_deploy_fn(params, state, gen_cfg)
    tiled_dep = tiled_sr(params, state, img, gen_cfg, tile=32, tile_batch=4,
                         fwd=lambda p, s, x: deploy(x))
    np.testing.assert_allclose(tiled_dep, tiled_eval, rtol=1e-3, atol=1e-4)


def test_recalibrate_bn_tracks_distribution(rng):
    """recalibrate_bn must (a) move BN running stats toward the calibration
    distribution's batch statistics, (b) leave params and every non-BN
    state leaf (SN power-iteration vectors) bit-identical, and (c) close
    the train-vs-deploy BN gap on off-distribution data once folded
    (the round-3 real_x2_v2 fresh-split regression: 2.2 dB)."""
    from sisr_tpu.infer import make_deploy_fn, recalibrate_bn
    from sisr_tpu.models.generator import generator_apply

    gen_cfg = GeneratorConfig(n_blocks=2, n_features_block=8,
                              n_features_last=16, use_sn=True)
    params, state = generator_init(jax.random.PRNGKey(0), gen_cfg)

    # calibration corpus drawn far from BN init stats (mean 0 / var 1):
    # a biased, low-variance input distribution
    cal = [jnp.asarray(rng.uniform(0.3, 0.8, (4, 8, 8, 3))
                       .astype(np.float32)) for _ in range(4)]
    new_state = recalibrate_bn(params, state, gen_cfg, cal, passes=12)

    # (b) non-BN leaves untouched
    def collect(tree, want_bn, path=""):
        out = {}
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k.startswith("bn") == want_bn or isinstance(v, (dict, list)):
                    if k.startswith("bn") and not want_bn:
                        continue
                    out.update(collect(v, want_bn, f"{path}/{k}"))
        elif isinstance(tree, list):
            for i, v in enumerate(tree):
                out.update(collect(v, want_bn, f"{path}/{i}"))
        else:
            out[path] = tree
        return out

    old_sn = collect(state, want_bn=False)
    new_sn = collect(new_state, want_bn=False)
    assert old_sn.keys() == new_sn.keys()
    for k in old_sn:
        np.testing.assert_array_equal(np.asarray(old_sn[k]),
                                      np.asarray(new_sn[k]), err_msg=k)

    # (a) BN stats moved
    old_bn = collect(state, want_bn=True)
    new_bn = collect(new_state, want_bn=True)
    moved = sum(float(np.abs(np.asarray(o) - np.asarray(n)).max()) > 1e-6
                for o, n in zip(old_bn.values(), new_bn.values()))
    assert moved >= len(old_bn) // 2, "recalibration did not move BN stats"

    # (c) folded deploy with recalibrated stats ~= train-mode BN forward on
    # the calibration distribution (init running stats are far off)
    x = cal[0]
    y_train, _ = generator_apply(params, state, x, train=True, cfg=gen_cfg)
    y_old = make_deploy_fn(params, state, gen_cfg)(x)
    y_new = make_deploy_fn(params, new_state, gen_cfg)(x)
    err_old = float(jnp.abs(y_old - y_train).mean())
    err_new = float(jnp.abs(y_new - y_train).mean())
    assert err_new < err_old, (err_new, err_old)


def test_recalibrate_bn_on_grown_generator(rng):
    """Recalibration must also work on the progressive (suffix-grown)
    architecture — the real_x4_v2 finetune evals with --recalibrate-bn on
    an x4 grown model: structure preserved, suffix + base BN stats both
    re-estimated, non-BN state untouched, deploy fold still applies."""
    from sisr_tpu.infer import make_deploy_fn, recalibrate_bn

    gen_cfg = GeneratorConfig(n_blocks=2, n_features_block=8,
                              n_features_last=16, use_sn=True, n_suffixes=1)
    params, state = generator_init(jax.random.PRNGKey(0), gen_cfg)
    cal = [jnp.asarray(rng.uniform(0.3, 0.8, (2, 8, 8, 3))
                       .astype(np.float32)) for _ in range(2)]
    new_state = recalibrate_bn(params, state, gen_cfg, cal, passes=3)

    assert (jax.tree_util.tree_structure(state)
            == jax.tree_util.tree_structure(new_state))
    moved = unchanged = 0
    new_leaves = dict(jax.tree_util.tree_leaves_with_path(new_state))
    for path, leaf in jax.tree_util.tree_leaves_with_path(state):
        key = jax.tree_util.keystr(path)
        same = bool(np.array_equal(np.asarray(leaf),
                                   np.asarray(new_leaves[path])))
        if "bn" in key:
            moved += (not same)
        else:
            assert same, f"non-BN state perturbed at {key}"
            unchanged += 1
    assert moved > 0 and unchanged > 0
    out = make_deploy_fn(params, new_state, gen_cfg)(cal[0])
    assert out.shape == (2, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_transposed_upscale_matches_subpixel(rng):
    """The input-dilated-conv rewrite of conv+pixel_shuffle+PReLU (serving
    design point: kills the C*r^2 intermediate and the shuffle transpose)
    must match the sub-pixel path bit-level (same dtype/precision)."""
    from sisr_tpu.infer import make_deploy_fn

    for n_suffixes in (0, 1):
        gen_cfg = GeneratorConfig(n_blocks=2, n_features_block=8,
                                  n_features_last=16, n_suffixes=n_suffixes)
        params, state = generator_init(jax.random.PRNGKey(3), gen_cfg)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32))
        y_ref = make_deploy_fn(params, state, gen_cfg)(x)
        y_ct = make_deploy_fn(params, state, gen_cfg,
                              use_transposed_upscale=True)(x)
        assert y_ct.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y_ct), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)


def test_perceptual_metrics(rng):
    """grad_ratio/gmsd/hf_energy_ratio: identity is perfect (1/0/1); a
    blurred image scores strictly worse on all three (the axis the
    adversarial recipe is supposed to win — VERDICT r4 next #4)."""
    from jax import lax

    from sisr_tpu.metrics import gmsd, grad_ratio, hf_energy_ratio

    hr = jnp.asarray(rng.uniform(-1, 1, (2, 48, 48, 3)).astype(np.float32))
    k = jnp.ones((5, 5, 1, 3), jnp.float32) / 25.0
    blur = lax.conv_general_dilated(
        hr, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=3)

    assert abs(float(grad_ratio(hr, hr)) - 1.0) < 1e-5
    assert float(gmsd(hr, hr)) < 1e-6
    assert abs(float(hf_energy_ratio(hr, hr)) - 1.0) < 1e-5
    assert float(grad_ratio(blur, hr)) < 0.8
    assert float(gmsd(blur, hr)) > 0.05
    assert float(hf_energy_ratio(blur, hr)) < 0.5
    # 1-channel (mnist geometry) path
    g = jnp.asarray(rng.uniform(-1, 1, (2, 28, 28, 1)).astype(np.float32))
    assert abs(float(grad_ratio(g, g)) - 1.0) < 1e-5
    # per-image shapes
    assert grad_ratio(hr, hr, per_image=True).shape == (2,)
    assert gmsd(hr, hr, per_image=True).shape == (2,)


def test_recalibrate_bn_preserves_container_types(rng):
    """merge() must rebuild tuples as tuples: a list-for-tuple swap changes
    the state pytree structure (ADVICE r4 low #4)."""
    from sisr_tpu.infer import recalibrate_bn

    gen_cfg = GeneratorConfig(n_blocks=1, n_features_block=8,
                              n_features_last=16)
    params, state = generator_init(jax.random.PRNGKey(0), gen_cfg)

    def listify(t):  # tuple-ify every list so the regression is visible
        if isinstance(t, dict):
            return {k: listify(v) for k, v in t.items()}
        if isinstance(t, list):
            return tuple(listify(v) for v in t)
        return t

    state_t = listify(state)
    cal = [jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32))]
    new_state = recalibrate_bn(params, state_t, gen_cfg, cal, passes=1)

    def check(old, new):
        assert type(old) is type(new), (type(old), type(new))
        if isinstance(old, dict):
            for k in old:
                check(old[k], new[k])
        elif isinstance(old, tuple):
            for o, n in zip(old, new):
                check(o, n)

    check(state_t, new_state)
