"""Data-parallel semantics on the virtual 8-device CPU mesh (the 'fake
backend' of SURVEY.md §4): a sharded step must match the single-device step
bit-for-bit-ish, since BN stats are globally synced by construction."""
import numpy as np

import jax
import jax.numpy as jnp

from sisr_tpu.config import GeneratorConfig, ReplayConfig, TrainConfig
from sisr_tpu.nn.pytree import flatten_with_paths
from sisr_tpu.parallel import make_mesh, shard_batch, shard_train_step
from sisr_tpu.train import init_train_state, make_train_step


def _cfg():
    return TrainConfig(dataset="tiny",
                       generator=GeneratorConfig(n_blocks=2, n_features_block=8,
                                                 n_features_last=16),
                       compute_dtype="float32", lr=1e-3, lr_decay=False,
                       replay=ReplayConfig(max_len=20, sample_ratio=0.1))


def test_mesh_spans_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 host devices


def test_dp_step_matches_single_device(rng):
    cfg = _cfg()
    ts1 = init_train_state(jax.random.PRNGKey(0), cfg)
    ts2 = jax.tree_util.tree_map(jnp.copy, ts1)

    hr_s, _ = cfg.geometry()
    b = 8  # divisible by mesh size
    hr = rng.uniform(-1, 1, (b, hr_s[1], hr_s[2], hr_s[0])).astype(np.float32)
    R = cfg.replay.max_samples
    replay = rng.uniform(-1, 1, (R, b, hr_s[1], hr_s[2], hr_s[0])).astype(np.float32)
    rmask = np.array([1.0] + [0.0] * (R - 1), np.float32)
    w = (jnp.float32(5e-2), jnp.float32(1.0), jnp.float32(10.0))

    # single device
    step1 = make_train_step(cfg, 100, d_active=True, g_adv_active=True,
                            cont_kind="identity", jit=True)
    ts1, fake1, m1 = step1(ts1, jnp.asarray(hr), jnp.asarray(hr),
                           jnp.asarray(replay), jnp.asarray(rmask), w)

    # 8-device data parallel
    mesh = make_mesh()
    raw = make_train_step(cfg, 100, d_active=True, g_adv_active=True,
                          cont_kind="identity", jit=False)
    step8 = shard_train_step(raw, mesh, donate=False)
    hr_sh = shard_batch(mesh, jnp.asarray(hr))
    ts2, fake8, m8 = step8(ts2, hr_sh, hr_sh, jnp.asarray(replay),
                           jnp.asarray(rmask), w)

    # fp32 reduction-order noise across shards bounds the comparison
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=3e-3,
                                   atol=1e-4, err_msg=k)
    np.testing.assert_allclose(np.asarray(fake1), np.asarray(fake8),
                               rtol=1e-3, atol=1e-4)
    f1 = flatten_with_paths(ts1["params_g"])
    f8 = flatten_with_paths(ts2["params_g"])
    for p in f1:
        # atol bound = 2.5 Adam steps: conv biases that feed straight into
        # BatchNorm have exactly-zero true gradient, so their first Adam
        # update is sign(fp-noise) * lr — layout-dependent and semantically
        # irrelevant. Everything else agrees far tighter.
        np.testing.assert_allclose(np.asarray(f1[p]), np.asarray(f8[p]),
                                   rtol=1e-3, atol=2.5 * 1e-3, err_msg=p)


def test_dp_device_data_step_matches_single_device(rng):
    """Device-resident corpus under data parallelism: the corpus is
    replicated across the mesh, index batches are sharded on dim 0, and
    the gathered sharded step must match the single-device value path."""
    from sisr_tpu.parallel.mesh import replicated

    cfg = _cfg()
    ts1 = init_train_state(jax.random.PRNGKey(0), cfg)
    ts2 = jax.tree_util.tree_map(jnp.copy, ts1)

    hr_s, _ = cfg.geometry()
    b = 8
    corpus = rng.uniform(-1, 1, (24, hr_s[1], hr_s[2],
                                 hr_s[0])).astype(np.float32)
    idx = rng.permutation(24)[:b].astype(np.int32)
    R = cfg.replay.max_samples
    replay = rng.uniform(-1, 1, (R, b, hr_s[1], hr_s[2],
                                 hr_s[0])).astype(np.float32)
    rmask = np.array([1.0] + [0.0] * (R - 1), np.float32)
    w = (jnp.float32(5e-2), jnp.float32(1.0), jnp.float32(10.0))

    # single device: raw batches (the value path the gather must hit)
    step1 = make_train_step(cfg, 100, d_active=True, g_adv_active=True,
                            cont_kind="identity", jit=True)
    hr = jnp.asarray(corpus[idx])
    ts1, fake1, m1 = step1(ts1, hr, hr, jnp.asarray(replay),
                           jnp.asarray(rmask), w)

    # 8-device DP: replicated corpus (an explicit argument — closing over
    # it would embed a captured lowering constant) + sharded (B,) indices
    mesh = make_mesh()
    corpus_dev = jax.device_put(corpus, replicated(mesh))
    raw = make_train_step(cfg, 100, d_active=True, g_adv_active=True,
                          cont_kind="identity", jit=False)
    step8 = shard_train_step(raw, mesh, donate=False, with_data=True)
    idx_sh = shard_batch(mesh, jnp.asarray(idx))
    ts2, fake8, m8 = step8(ts2, idx_sh, idx_sh, jnp.asarray(replay),
                           jnp.asarray(rmask), w, corpus_dev)

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=3e-3,
                                   atol=1e-4, err_msg=k)
    np.testing.assert_allclose(np.asarray(fake1), np.asarray(fake8),
                               rtol=1e-3, atol=1e-4)


def test_dp_dfeat_step_matches_single_device(rng):
    """The dfeat (D-feature-matching) content loss under data parallelism:
    the sharded step must match single-device — discriminator_features runs
    an eval-mode D pass inside the G update, and its global feature-MSE
    must reduce across shards via GSPMD, not silently per-shard."""
    import dataclasses

    cfg = _cfg()
    cfg = dataclasses.replace(cfg, content_extractor="dfeat",
                              d_features=(8, 16), d_strides=(1, 2),
                              dfeat_taps=(0,), dfeat_scale=2.0)
    ts1 = init_train_state(jax.random.PRNGKey(0), cfg)
    ts2 = jax.tree_util.tree_map(jnp.copy, ts1)

    hr_s, _ = cfg.geometry()
    b = 8
    hr = rng.uniform(-1, 1, (b, hr_s[1], hr_s[2], hr_s[0])).astype(np.float32)
    R = cfg.replay.max_samples
    replay = rng.uniform(-1, 1, (R, b, hr_s[1], hr_s[2], hr_s[0])).astype(np.float32)
    rmask = np.array([1.0] + [0.0] * (R - 1), np.float32)
    w = (jnp.float32(5e-2), jnp.float32(1.0), jnp.float32(2.0))

    step1 = make_train_step(cfg, 100, d_active=True, g_adv_active=True,
                            cont_kind="dfeat", jit=True)
    ts1, fake1, m1 = step1(ts1, jnp.asarray(hr), jnp.asarray(hr),
                           jnp.asarray(replay), jnp.asarray(rmask), w)

    mesh = make_mesh()
    raw = make_train_step(cfg, 100, d_active=True, g_adv_active=True,
                          cont_kind="dfeat", jit=False)
    step8 = shard_train_step(raw, mesh, donate=False)
    hr_sh = shard_batch(mesh, jnp.asarray(hr))
    ts2, fake8, m8 = step8(ts2, hr_sh, hr_sh, jnp.asarray(replay),
                           jnp.asarray(rmask), w)

    assert float(m1["errG_cont"]) > 0.0  # the dfeat term is live
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=3e-3,
                                   atol=1e-4, err_msg=k)
    np.testing.assert_allclose(np.asarray(fake1), np.asarray(fake8),
                               rtol=1e-3, atol=1e-4)
    f1 = flatten_with_paths(ts1["params_g"])
    f8 = flatten_with_paths(ts2["params_g"])
    for p in f1:
        np.testing.assert_allclose(np.asarray(f1[p]), np.asarray(f8[p]),
                                   rtol=1e-3, atol=2.5 * 1e-3, err_msg=p)


def test_dp_fused_driver_matches_single_device(rng):
    """The fused K-step scan driver composed with the mesh: DP-fused must
    match single-device-fused (the production path must not silently run
    single-device, VERDICT r1 item 6)."""
    import dataclasses
    from sisr_tpu.train.multi_step import init_replay_state, make_multi_step

    cfg = _cfg()
    cfg = dataclasses.replace(cfg, replay=ReplayConfig(max_len=10,
                                                       sample_ratio=0.2))
    hr_s, _ = cfg.geometry()
    B, K = 8, 3
    hrs = rng.uniform(-1, 1, (K, B, hr_s[1], hr_s[2], hr_s[0])) \
        .astype(np.float32)
    w = (jnp.float32(5e-2), jnp.float32(1.0), jnp.float32(10.0))

    outs = []
    for mesh in (None, make_mesh()):
        ts = init_train_state(jax.random.PRNGKey(0), cfg)
        rs = init_replay_state(cfg, (B, hr_s[1], hr_s[2], hr_s[0]))
        fused = make_multi_step(cfg, 100, k_steps=K, d_active=True,
                                g_adv_active=True, cont_kind="identity",
                                mesh=mesh)
        ts, rs, m = fused(ts, rs, jnp.asarray(hrs), jnp.asarray(hrs), w)
        outs.append((ts, rs, m))

    (ts1, rs1, m1), (ts8, rs8, m8) = outs
    assert int(rs8["n"]) == K
    # step 0 must agree tightly (same math, sharded); later steps only
    # loosely — fp32 reduction-order noise is amplified by the chained GAN
    # dynamics (param updates feed the next step's batch stats)
    for k in m1:
        np.testing.assert_allclose(float(m1[k][0]), float(m8[k][0]),
                                   rtol=3e-3, atol=1e-4, err_msg=k)
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m8[k]),
                                   rtol=8e-2, atol=1e-3, err_msg=k)
    f1 = flatten_with_paths(ts1["params_g"])
    f8 = flatten_with_paths(ts8["params_g"])
    for p in f1:
        np.testing.assert_allclose(np.asarray(f1[p]), np.asarray(f8[p]),
                                   rtol=1e-2, atol=3 * K * 1e-3, err_msg=p)
    # the replay ring itself must agree (fakes stored identically)
    np.testing.assert_allclose(
        np.asarray(rs1["stack"][:K], np.float32),
        np.asarray(rs8["stack"][:K], np.float32), rtol=5e-2, atol=6e-2)


def test_dp_fused_device_data_matches_single_device(rng):
    """Fused K-step driver + mesh + device-resident corpus: the corpus is
    an explicit replicated argument (cfg.device_data extends the mesh
    in_shardings arity) and DP must match single-device on index stacks."""
    import dataclasses
    from sisr_tpu.parallel.mesh import replicated
    from sisr_tpu.train.multi_step import init_replay_state, make_multi_step

    cfg = _cfg()
    cfg = dataclasses.replace(cfg, device_data=True,
                              replay=ReplayConfig(max_len=10,
                                                  sample_ratio=0.2))
    hr_s, _ = cfg.geometry()
    B, K, N = 8, 2, 24
    corpus = rng.uniform(-1, 1, (N, hr_s[1], hr_s[2],
                                 hr_s[0])).astype(np.float32)
    idx = rng.integers(0, N, (K, B)).astype(np.int32)
    w = (jnp.float32(5e-2), jnp.float32(1.0), jnp.float32(10.0))

    outs = []
    for mesh in (None, make_mesh()):
        ts = init_train_state(jax.random.PRNGKey(0), cfg)
        rs = init_replay_state(cfg, (B, hr_s[1], hr_s[2], hr_s[0]))
        fused = make_multi_step(cfg, 100, k_steps=K, d_active=True,
                                g_adv_active=True, cont_kind="identity",
                                mesh=mesh)
        data = jnp.asarray(corpus) if mesh is None \
            else jax.device_put(corpus, replicated(mesh))
        ts, rs, m = fused(ts, rs, jnp.asarray(idx), jnp.asarray(idx), w,
                          data)
        outs.append(m)

    m1, m8 = outs
    for k in m1:
        np.testing.assert_allclose(float(m1[k][0]), float(m8[k][0]),
                                   rtol=3e-3, atol=1e-4, err_msg=k)


def test_sharded_deploy_inference_matches_single(rng):
    """Batch-parallel serving: the folded deploy fn sharded over the mesh
    must reproduce the single-device output (inference analog of the
    reference's DataParallel wrap, config.py:114-118)."""
    from sisr_tpu.infer import deploy_apply, fold_generator
    from sisr_tpu.models.generator import generator_init
    from sisr_tpu.parallel import shard_infer_fn

    gcfg = GeneratorConfig(n_blocks=2, n_features_block=8, n_features_last=16)
    params, state = generator_init(jax.random.PRNGKey(0), gcfg)
    fp, _ = fold_generator(params, state, gcfg)
    fn = lambda x: deploy_apply(fp, x, gcfg)  # noqa: E731

    x = jnp.asarray(rng.uniform(-1, 1, (8, 12, 12, 3)).astype(np.float32))
    y1 = jax.jit(fn)(x)
    mesh = make_mesh()
    y8 = shard_infer_fn(fn, mesh)(shard_batch(mesh, x))
    assert "data" in str(y8.sharding.spec)
    np.testing.assert_allclose(np.asarray(y8), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)
