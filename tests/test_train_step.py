"""Training-engine tests: losses, schedules, optimizer parity, replay
semantics, and the jitted GAN step (SURVEY.md §4 'implication for the TPU
build')."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sisr_tpu.config import (
    INF,
    GeneratorConfig,
    LossWindows,
    ReplayConfig,
    TrainConfig,
)
from sisr_tpu.nn.pytree import flatten_with_paths
from sisr_tpu.train.losses import bce_with_logits
from sisr_tpu.train.optim import adam_update, make_adam, make_lr_schedule, trainable_mask
from sisr_tpu.train.replay import ReplayBuffer
from sisr_tpu.train.step import epoch_step_builder, init_train_state, make_train_step


def tiny_cfg(**kw):
    return TrainConfig(
        dataset="tiny",
        generator=GeneratorConfig(n_blocks=2, n_features_block=8,
                                  n_features_last=16, list_scales=(2,)),
        compute_dtype="float32",
        replay=ReplayConfig(max_len=20, sample_ratio=0.1),
        **kw,
    )


# ---------------------------------------------------------------------------
# losses / schedules / optim
# ---------------------------------------------------------------------------


def test_bce_parity_vs_torch(rng):
    logits = rng.standard_normal(32).astype(np.float32) * 3
    for target in (0.0, 0.9, 1.0):
        ours = float(bce_with_logits(jnp.asarray(logits), target))
        t = torch.sigmoid(torch.from_numpy(logits))
        ref = torch.nn.BCELoss()(t, torch.full((32,), target)).item()
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_lr_schedule_matches_reference_decay():
    # f ** total_steps == 0.1 (reference config.py:170-177)
    sched = make_lr_schedule(1e-5, 300, decay=True)
    assert float(sched(jnp.asarray(0))) == pytest.approx(1e-5)
    assert float(sched(jnp.asarray(300))) == pytest.approx(1e-6, rel=1e-4)
    sched = make_lr_schedule(1e-5, 300, decay=False)
    assert float(sched(jnp.asarray(299))) == pytest.approx(1e-5)


def test_adam_parity_vs_torch(rng):
    w0 = rng.standard_normal((5, 3)).astype(np.float32)
    params = {"w": jnp.asarray(w0)}
    adam = make_adam()
    opt_state = adam.init(params)

    wt = torch.tensor(w0, requires_grad=True)
    topt = torch.optim.Adam([wt], lr=1e-2, betas=(0.9, 0.999))

    for i in range(5):
        g = rng.standard_normal((5, 3)).astype(np.float32)
        grads = {"w": jnp.asarray(g)}
        params, opt_state = adam_update(adam, opt_state, grads, params,
                                        jnp.asarray(1e-2))
        wt.grad = torch.from_numpy(g)
        topt.step()
    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_loss_windows_replicate_reference():
    # defaults: everything on, VGG content (reference gen_losses defaults)
    w = LossWindows()
    assert w.weights(0, False) == (5e-2, 1.0, 1.0, "vgg")
    # unsupervised: identity on LR at weight 10*10, adv_g 5e-3
    w = LossWindows(content=(0, 0), identity=(0, INF))
    assert w.weights(2, True) == (5e-3, 1.0, 100.0, "identity")
    # ramp: MSE pretrain epoch 0, GAN from epoch 1
    w = LossWindows(adv_g=(1, INF), adv_d=(1, INF), content=(1, INF), identity=(0, 1))
    assert w.weights(0, False) == (0.0, 0.0, 10.0, "identity")
    assert w.weights(1, False) == (5e-2, 1.0, 1.0, "vgg")
    # disjointness contract (reference config.py:154)
    with pytest.raises(ValueError):
        LossWindows(content=(0, 2), identity=(1, 3))


def test_trainable_mask_prefixes():
    params = {"base": {"blocks": [{"w": jnp.ones(1)}], "end": {"w": jnp.ones(1)}},
              "upscale": {"w": jnp.ones(1)}}
    mask = trainable_mask(params, ["base/blocks", "base/end"])
    flat = flatten_with_paths(mask)
    assert flat["base/blocks/0/w"] is False
    assert flat["base/end/w"] is False
    assert flat["upscale/w"] is True


# ---------------------------------------------------------------------------
# replay buffer
# ---------------------------------------------------------------------------


def test_replay_buffer_semantics():
    cfg = ReplayConfig(max_len=10, save_freq=2, sample_ratio=0.3)
    buf = ReplayBuffer(cfg, (2, 4, 4, 3), seed=0)
    assert cfg.max_samples == 3

    # empty: all-dead mask
    stack, mask = buf.sample()
    assert stack.shape == (3, 2, 4, 4, 3) and mask.sum() == 0

    # save_freq gating
    for it in range(8):
        buf.maybe_store(it, np.full((2, 4, 4, 3), it, np.float32))
    assert len(buf) == 4  # only even iterations

    # live count = int(len * ratio)
    _, mask = buf.sample()
    assert mask.sum() == int(4 * 0.3) == 1

    # eviction keeps len at max_len
    for it in range(100):
        buf.maybe_store(2 * it, np.zeros((2, 4, 4, 3), np.float32))
    assert len(buf) == 10

    # persistence roundtrip + scale-mismatch refusal (config.py:323-331)
    sd = buf.state_dict()
    buf2 = ReplayBuffer(cfg, (2, 4, 4, 3))
    assert buf2.load_state_dict(sd, scale_matches=True) == 10
    assert buf2.load_state_dict(sd, scale_matches=False) == 0


# ---------------------------------------------------------------------------
# train step
# ---------------------------------------------------------------------------


def _batch(rng, cfg, b=2):
    hr_s, _ = cfg.geometry()
    return jnp.asarray(rng.uniform(-1, 1, (b, hr_s[1], hr_s[2], hr_s[0])).astype(np.float32))


def test_mse_only_step_decreases_loss(rng):
    cfg = tiny_cfg(windows=LossWindows(adv_g=(0, 0), adv_d=(0, 0),
                                       content=(0, 0), identity=(0, INF)),
                   lr=1e-3, lr_decay=False)
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, 100, d_active=False, g_adv_active=False,
                           cont_kind="identity", jit=True)
    hr = _batch(rng, cfg)
    replay = jnp.zeros((cfg.replay.max_samples, *hr.shape), jnp.float32)
    rmask = jnp.zeros((cfg.replay.max_samples,), jnp.float32)
    w = (jnp.float32(0), jnp.float32(0), jnp.float32(100.0))

    losses = []
    for _ in range(8):
        ts, fake, m = step(ts, hr, hr, replay, rmask, w)
        losses.append(float(m["errG_cont"]))
    assert losses[-1] < losses[0] * 0.9, losses
    # D untouched in MSE-only mode
    assert float(m["errD"]) == 0.0
    assert int(ts["step"]) == 8


def test_gan_step_full(rng):
    cfg = tiny_cfg(lr=1e-4, lr_decay=True)
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, 100, d_active=True, g_adv_active=True,
                           cont_kind="identity", jit=True)
    hr = _batch(rng, cfg)
    R = cfg.replay.max_samples
    replay = jnp.asarray(rng.uniform(-1, 1, (R, *hr.shape)).astype(np.float32))
    rmask = jnp.asarray(np.array([1.0] + [0.0] * (R - 1), np.float32))

    pd0 = np.asarray(flatten_with_paths(ts["params_d"])["fc2/kernel"])
    pg0 = np.asarray(flatten_with_paths(ts["params_g"])["end/conv/kernel"])
    ts, fake, m = step(ts, hr, hr, replay, rmask,
                       (jnp.float32(5e-2), jnp.float32(1.0), jnp.float32(10.0)))

    for k in ("errD", "errG_adv", "errG_cont", "D_x", "D_G_z1", "D_G_z2"):
        assert np.isfinite(float(m[k])), (k, m)
    assert fake.shape == hr.shape
    # both nets updated
    assert not np.allclose(pd0, np.asarray(flatten_with_paths(ts["params_d"])["fc2/kernel"]))
    assert not np.allclose(pg0, np.asarray(flatten_with_paths(ts["params_g"])["end/conv/kernel"]))
    # errD includes real + fake + 1 live replay slot (all ~log(2)-scale terms)
    assert 0.5 < float(m["errD"]) < 10.0


def test_uint8_batch_step_matches_fp32(rng):
    """uint8 transport: feeding the raw uint8 batch to the step (which
    normalizes on-device via ops.resize.device_normalize) must produce the
    same update as feeding the host-normalized fp32 batch."""
    cfg = tiny_cfg(lr=1e-4, lr_decay=True)
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, 100, d_active=True, g_adv_active=True,
                           cont_kind="identity", jit=True)
    hr_s, _ = cfg.geometry()
    u8 = rng.integers(0, 256, (2, hr_s[1], hr_s[2], hr_s[0]),
                      dtype=np.uint8)
    hr32 = jnp.asarray(u8.astype(np.float32) / 255.0 * 2.0 - 1.0)
    R = cfg.replay.max_samples
    replay = jnp.asarray(rng.uniform(-1, 1, (R, 2, hr_s[1], hr_s[2],
                                             hr_s[0])).astype(np.float32))
    rmask = jnp.asarray(np.array([1.0] + [0.0] * (R - 1), np.float32))
    w = (jnp.float32(5e-2), jnp.float32(1.0), jnp.float32(10.0))

    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731
    ts8, fake8, m8 = step(copy(ts), jnp.asarray(u8), jnp.asarray(u8),
                          replay, rmask, w)
    ts32, fake32, m32 = step(copy(ts), hr32, hr32, replay, rmask, w)

    # not bit-exact: XLA fuses the on-device u8->[-1,1] convert into the
    # first conv, so the normalized input can differ from the host-side
    # value by 1 ulp, which the G+D ladder amplifies to ~1e-5 relative
    np.testing.assert_allclose(np.asarray(fake8), np.asarray(fake32),
                               rtol=1e-4, atol=1e-5)
    for k in m32:
        np.testing.assert_allclose(float(m8[k]), float(m32[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    # params are deliberately NOT compared: Adam's first step is
    # ~lr*g/(|g|+eps), so a 1-ulp input difference flips near-zero grads'
    # normalized direction — ill-conditioned by construction, not a
    # transport bug (the value/loss contracts above are the real ones)
    assert int(ts8["step"]) == int(ts32["step"]) == 1


def test_replay_mask_changes_d_loss(rng):
    cfg = tiny_cfg()
    ts = init_train_state(jax.random.PRNGKey(1), cfg)
    step = make_train_step(cfg, 100, d_active=True, g_adv_active=False,
                           cont_kind=None, jit=True)
    hr = _batch(rng, cfg)
    R = cfg.replay.max_samples
    replay = jnp.asarray(rng.uniform(-1, 1, (R, *hr.shape)).astype(np.float32))
    w = (jnp.float32(0), jnp.float32(1.0), jnp.float32(0))

    _, _, m0 = step(jax.tree_util.tree_map(jnp.copy, ts), hr, hr, replay,
                    jnp.zeros((R,), jnp.float32), w)
    _, _, m2 = step(jax.tree_util.tree_map(jnp.copy, ts), hr, hr, replay,
                    jnp.ones((R,), jnp.float32), w)
    # each live slot adds a positive BCE term (summed, reference train.py:166)
    assert float(m2["errD"]) > float(m0["errD"]) + 0.1


def test_d_inactive_epoch_freezes_d(rng):
    cfg = tiny_cfg(windows=LossWindows(adv_g=(0, 0), adv_d=(0, 0),
                                       content=(0, 0), identity=(0, INF)))
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, 100, d_active=False, g_adv_active=False,
                           cont_kind="identity", jit=True)
    hr = _batch(rng, cfg)
    R = cfg.replay.max_samples
    replay = jnp.zeros((R, *hr.shape), jnp.float32)
    d_before = jax.tree_util.tree_map(np.asarray, ts["params_d"])
    opt_d_before = jax.tree_util.tree_map(np.asarray, ts["opt_d"])
    ts, _, _ = step(ts, hr, hr, replay, jnp.zeros((R,), jnp.float32),
                    (jnp.float32(0), jnp.float32(0), jnp.float32(100.0)))
    # D params AND adam state bit-identical (reference only steps optimizerD
    # inside the lw_adv_d branch, train.py:73-75)
    for a, b in zip(jax.tree_util.tree_leaves(d_before),
                    jax.tree_util.tree_leaves(ts["params_d"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_d_before),
                    jax.tree_util.tree_leaves(ts["opt_d"])):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_freeze_mask_bitfreezes_params(rng):
    """Reference _test_gen2 analog (model_generator.py:161-184): frozen
    prefix params bitwise unchanged after an optimizer step; others move."""
    from sisr_tpu.models.generator import generator_freeze_prefixes
    from sisr_tpu.train.optim import trainable_mask

    gen = GeneratorConfig(n_blocks=2, n_features_block=8, n_features_last=16,
                          list_scales=(2,), n_suffixes=1)
    cfg = TrainConfig(dataset="tiny", generator=gen, compute_dtype="float32",
                      windows=LossWindows(adv_g=(0, 0), adv_d=(0, 0),
                                          content=(0, 0), identity=(0, INF)),
                      lr=1e-2, lr_decay=False,
                      replay=ReplayConfig(max_len=20, sample_ratio=0.1))
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    prefixes = generator_freeze_prefixes(1, freeze_upscale=False, freeze_end=False)
    mask = trainable_mask(ts["params_g"], prefixes)
    step = make_train_step(cfg, 10, d_active=False, g_adv_active=False,
                           cont_kind="identity", mask_g=mask, jit=True)
    hr = _batch(rng, cfg, b=2)
    R = cfg.replay.max_samples
    before = flatten_with_paths(jax.tree_util.tree_map(np.asarray, ts["params_g"]))
    ts, _, _ = step(ts, hr, hr, jnp.zeros((R, *hr.shape), jnp.float32),
                    jnp.zeros((R,), jnp.float32),
                    (jnp.float32(0), jnp.float32(0), jnp.float32(100.0)))
    after = flatten_with_paths(ts["params_g"])
    moved = unmoved = 0
    for path, b in before.items():
        a = np.asarray(after[path])
        frozen = any(path.startswith(p) for p in prefixes)
        if frozen:
            np.testing.assert_array_equal(a, b, err_msg=path)
            unmoved += 1
        elif not np.array_equal(a, b):
            moved += 1
    assert unmoved > 10 and moved >= 2  # suffix upscale (+shared-end grads flow)


def test_epoch_step_builder_variant_cache():
    cfg = tiny_cfg(windows=LossWindows(adv_g=(1, INF), adv_d=(1, INF),
                                       content=(1, INF), identity=(0, 1)))
    get = epoch_step_builder(cfg, 100, vgg_params={"convs": []}, jit=False)
    f0, w0 = get(0)
    f1, w1 = get(1)
    f1b, _ = get(2)
    assert f0 is not f1 and f1 is f1b
    assert float(w0[0]) == 0.0 and float(w1[0]) == pytest.approx(5e-2)


def test_device_replay_buffer_semantics():
    from sisr_tpu.train.replay_device import DeviceReplayBuffer

    cfg = ReplayConfig(max_len=10, save_freq=2, sample_ratio=0.3)
    buf = DeviceReplayBuffer(cfg, (2, 4, 4, 3), seed=0)

    stack, mask = buf.sample()
    assert stack.shape == (3, 2, 4, 4, 3) and float(mask.sum()) == 0

    for it in range(8):
        buf.maybe_store(it, jnp.full((2, 4, 4, 3), it, jnp.float32))
    assert len(buf) == 4  # save_freq gating

    stack, mask = buf.sample()
    assert float(mask.sum()) == int(4 * 0.3) == 1
    # live slots hold stored batches (values in {0,2,4,6})
    live = np.asarray(stack)[np.asarray(mask) > 0]
    assert set(np.unique(live)).issubset({0.0, 2.0, 4.0, 6.0})

    for it in range(100):
        buf.maybe_store(2 * it, jnp.zeros((2, 4, 4, 3)))
    assert len(buf) == 10  # eviction bounded

    sd = buf.state_dict()
    buf2 = DeviceReplayBuffer(cfg, (2, 4, 4, 3))
    assert buf2.load_state_dict(sd, scale_matches=True) == 10
    assert buf2.load_state_dict(sd, scale_matches=False) == 0


def test_device_replay_distinct_sample_indices():
    from sisr_tpu.train.replay_device import DeviceReplayBuffer

    cfg = ReplayConfig(max_len=20, save_freq=1, sample_ratio=0.25)
    buf = DeviceReplayBuffer(cfg, (1, 2, 2, 1), seed=1)
    for it in range(20):
        buf.maybe_store(it, jnp.full((1, 2, 2, 1), it, jnp.float32))
    stack, mask = buf.sample()
    assert float(mask.sum()) == 5
    live = np.asarray(stack)[np.asarray(mask) > 0][:, 0, 0, 0].reshape(-1)
    assert len(set(live.tolist())) == 5  # without replacement


def test_fused_multi_step_matches_semantics():
    """K scanned steps advance state identically in structure to K single
    steps and exercise in-graph replay."""
    from sisr_tpu.train.multi_step import init_replay_state, make_multi_step

    cfg = tiny_cfg(lr=1e-3, lr_decay=False)
    import dataclasses
    cfg = dataclasses.replace(cfg, replay=ReplayConfig(max_len=10,
                                                       sample_ratio=0.2))
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    hr_s, _ = cfg.geometry()
    B, K = 2, 5
    rs = init_replay_state(cfg, (B, hr_s[1], hr_s[2], hr_s[0]))
    fused = make_multi_step(cfg, 100, k_steps=K, d_active=True,
                            g_adv_active=True, cont_kind="identity")
    rng = np.random.default_rng(0)
    hrs = jnp.asarray(rng.uniform(-1, 1, (K, B, hr_s[1], hr_s[2], hr_s[0]))
                      .astype(np.float32))
    w = (jnp.float32(5e-2), jnp.float32(1.0), jnp.float32(10.0))
    ts, rs, m = fused(ts, rs, hrs, hrs, w)
    assert int(ts["step"]) == K and int(rs["n"]) == K
    assert m["errD"].shape == (K,)
    assert np.isfinite(np.asarray(m["errD"])).all()


def test_fused_driver_store_gated_on_d():
    """d_active=False epochs must not fill the replay ring (reference stores
    inside the `if lw_adv_d:` branch, train.py:59-71)."""
    from sisr_tpu.train.multi_step import init_replay_state, make_multi_step

    import dataclasses
    cfg = tiny_cfg(lr=1e-3, lr_decay=False)
    cfg = dataclasses.replace(cfg, replay=ReplayConfig(max_len=10,
                                                       sample_ratio=0.2))
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    hr_s, _ = cfg.geometry()
    B, K = 2, 3
    rs = init_replay_state(cfg, (B, hr_s[1], hr_s[2], hr_s[0]))
    fused = make_multi_step(cfg, 100, k_steps=K, d_active=False,
                            g_adv_active=False, cont_kind="identity")
    rng = np.random.default_rng(0)
    hrs = jnp.asarray(rng.uniform(-1, 1, (K, B, hr_s[1], hr_s[2], hr_s[0]))
                      .astype(np.float32))
    w = (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(10.0))
    ts, rs, _ = fused(ts, rs, hrs, hrs, w)
    assert int(ts["step"]) == K and int(rs["n"]) == 0


# ---------------------------------------------------------------------------
# dfeat: discriminator-feature-matching content loss (the egress-free
# learned perceptual loss; reference role: model_content_extractor.py:33-60)
# ---------------------------------------------------------------------------


def test_dfeat_features_are_the_real_ladder_activations(rng, monkeypatch):
    """Tapping the LAST ladder block and appending the fc head must
    reproduce discriminator_apply's eval logit exactly — i.e. the extractor
    returns the discriminator's true intermediate activations, not a
    re-derivation."""
    import sisr_tpu.models.discriminator as D

    monkeypatch.setattr(D, "FUSE_STEM", False)  # exact same op order
    cfg = tiny_cfg()
    dis_cfg = cfg.discriminator()
    params, state = D.discriminator_init(jax.random.PRNGKey(3), dis_cfg)
    x = _batch(rng, cfg, b=2)

    last = len(dis_cfg.list_n_features) - 2  # final block index
    feats = D.discriminator_features(params, state, x, cfg=dis_cfg,
                                     taps=(last,))
    assert feats.shape == (2, dis_cfg.fc_in)

    from sisr_tpu.nn.layers import leaky_relu, linear_apply
    h = leaky_relu(linear_apply(params["fc1"], feats))
    logit_via_feats = linear_apply(params["fc2"], h).reshape(2)
    logit_ref, _ = D.discriminator_apply(params, state, x, train=False,
                                         cfg=dis_cfg, return_logits=True)
    np.testing.assert_allclose(np.asarray(logit_via_feats),
                               np.asarray(logit_ref), rtol=1e-5, atol=1e-6)


def test_dfeat_fully_convolutional_any_size(rng):
    """No fc head -> LR-sized inputs work (the unsupervised mode feeds LR
    images, reference train.py:95-97), and tap widths follow the ladder."""
    from sisr_tpu.models.discriminator import (discriminator_features,
                                               discriminator_init)

    cfg = tiny_cfg()
    dis_cfg = cfg.discriminator()
    params, state = discriminator_init(jax.random.PRNGKey(0), dis_cfg)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32))
    feats = discriminator_features(params, state, x, cfg=dis_cfg,
                                   taps=(1, 3, 5))
    # strides to taps 1/3/5 are 2/4/8; features 128/256/512
    n = 4 * 4 * 128 + 2 * 2 * 256 + 1 * 1 * 512
    assert feats.shape == (2, n)
    assert np.isfinite(np.asarray(feats)).all()


def test_dfeat_config_resolution():
    """content_extractor='dfeat' rewires the content window's 'vgg' kind to
    'dfeat' at w_cont * dfeat_scale; 1-channel data keeps dfeat (no identity
    substitution — D's input is 1-channel there too)."""
    cfg = tiny_cfg(content_extractor="dfeat", dfeat_scale=3.0)
    w_ag, w_ad, w_c, ck = cfg.epoch_weights(0)
    assert ck == "dfeat" and w_c == pytest.approx(3.0)
    import dataclasses
    mnist = dataclasses.replace(cfg, dataset="mnist")
    assert mnist.epoch_weights(0)[3] == "dfeat"
    # identity windows unaffected
    cfg2 = tiny_cfg(content_extractor="dfeat",
                    windows=LossWindows(content=(0, 0), identity=(0, INF)))
    assert cfg2.epoch_weights(0)[3] == "identity"


def test_dfeat_step_trains_g_and_leaves_d_constant(rng):
    """A cont-only dfeat step moves G (gradients flow through D's
    activations into the fake image) while D params/opt stay bit-identical
    (the extractor is a constant of the G update)."""
    cfg = tiny_cfg(content_extractor="dfeat", lr=1e-3, lr_decay=False,
                   windows=LossWindows(adv_g=(0, 0), adv_d=(0, 0),
                                       content=(0, INF)))
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, 100, d_active=False, g_adv_active=False,
                           cont_kind="dfeat", jit=True)
    hr = _batch(rng, cfg)
    R = cfg.replay.max_samples
    replay = jnp.zeros((R, *hr.shape), jnp.float32)
    d_before = jax.tree_util.tree_map(np.asarray, ts["params_d"])
    g_before = np.asarray(flatten_with_paths(ts["params_g"])["end/conv/kernel"])

    losses = []
    for _ in range(6):
        ts, _, m = step(ts, hr, hr, replay, jnp.zeros((R,), jnp.float32),
                        (jnp.float32(0), jnp.float32(0), jnp.float32(1.0)))
        losses.append(float(m["errG_cont"]))
    assert all(np.isfinite(losses)) and losses[0] > 0
    assert losses[-1] < losses[0], losses  # feature matching descends
    assert not np.allclose(
        g_before, np.asarray(flatten_with_paths(ts["params_g"])["end/conv/kernel"]))
    for a, b in zip(jax.tree_util.tree_leaves(d_before),
                    jax.tree_util.tree_leaves(ts["params_d"])):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_dfeat_full_gan_step_and_tap_validation(rng):
    cfg = tiny_cfg(content_extractor="dfeat")
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, 100, d_active=True, g_adv_active=True,
                           cont_kind="dfeat", jit=True)
    hr = _batch(rng, cfg)
    R = cfg.replay.max_samples
    replay = jnp.asarray(rng.uniform(-1, 1, (R, *hr.shape)).astype(np.float32))
    rmask = jnp.asarray(np.array([1.0] + [0.0] * (R - 1), np.float32))
    ts, fake, m = step(ts, hr, hr, replay, rmask,
                       (jnp.float32(5e-2), jnp.float32(1.0), jnp.float32(1.0)))
    for k in ("errD", "errG_adv", "errG_cont"):
        assert np.isfinite(float(m[k])), (k, m)
    assert float(m["errG_cont"]) > 0

    import dataclasses
    bad = dataclasses.replace(cfg, dfeat_taps=(99,))
    with pytest.raises(ValueError, match="dfeat_taps"):
        make_train_step(bad, 100, d_active=True, g_adv_active=True,
                        cont_kind="dfeat", jit=False)


def test_dfeat_fused_multi_step(rng):
    """dfeat composes with the fused K-step scan driver (--fused-steps)."""
    from sisr_tpu.train.multi_step import init_replay_state, make_multi_step

    import dataclasses
    cfg = tiny_cfg(content_extractor="dfeat", lr=1e-3, lr_decay=False)
    cfg = dataclasses.replace(cfg, replay=ReplayConfig(max_len=10,
                                                       sample_ratio=0.2))
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    hr_s, _ = cfg.geometry()
    B, K = 2, 3
    rs = init_replay_state(cfg, (B, hr_s[1], hr_s[2], hr_s[0]))
    fused = make_multi_step(cfg, 100, k_steps=K, d_active=True,
                            g_adv_active=True, cont_kind="dfeat")
    hrs = jnp.asarray(rng.uniform(-1, 1, (K, B, hr_s[1], hr_s[2], hr_s[0]))
                      .astype(np.float32))
    w = (jnp.float32(5e-2), jnp.float32(1.0), jnp.float32(1.0))
    ts, rs, m = fused(ts, rs, hrs, hrs, w)
    assert int(ts["step"]) == K
    assert np.isfinite(np.asarray(m["errG_cont"])).all()
    assert float(np.asarray(m["errG_cont"]).min()) > 0


def test_lr_decay_restarts_on_resume(rng):
    """The LR schedule counts from the run's starting step (sched_step0), so
    a resumed run decays from full base LR like the reference, which
    rebuilds LambdaLR each run (config.py:170-180)."""
    cfg = tiny_cfg(lr=1e-3, lr_decay=True)
    hr = _batch(rng, cfg, b=2)
    R = cfg.replay.max_samples
    replay = jnp.zeros((R, *hr.shape), jnp.float32)
    rmask = jnp.zeros((R,), jnp.float32)
    w = (jnp.float32(0), jnp.float32(0), jnp.float32(10.0))

    def one_update(step0_val, sched_step0):
        ts = init_train_state(jax.random.PRNGKey(0), cfg)
        ts["step"] = jnp.asarray(step0_val, jnp.int32)
        step = make_train_step(cfg, 10, d_active=False, g_adv_active=False,
                               cont_kind="identity", jit=True,
                               sched_step0=sched_step0)
        ts, _, _ = step(ts, hr, hr, replay, rmask, w)
        return np.asarray(jax.tree_util.tree_leaves(ts["params_g"])[0])

    fresh = one_update(0, 0)
    resumed = one_update(50, 50)   # restarted schedule: same effective LR
    stale = one_update(50, 0)      # old behavior: decayed LR -> smaller move
    np.testing.assert_array_equal(fresh, resumed)
    assert not np.array_equal(fresh, stale)
