"""Checkpoint save/load/resume + transplant (pytree surgery) tests —
the reference's progressive-growth semantics (SURVEY.md §5 'checkpoint/
resume', model_generator.py:65-84, config.py:308-331)."""
import os

import numpy as np

import jax
import jax.numpy as jnp

from sisr_tpu.checkpoint import (
    load_checkpoint,
    next_write_path,
    pack_train_state,
    restore_train_state,
    save_checkpoint,
    transplant,
)
from sisr_tpu.config import GeneratorConfig, ReplayConfig, TrainConfig
from sisr_tpu.models.generator import generator_init, grow_suffix
from sisr_tpu.nn.pytree import flatten_with_paths
from sisr_tpu.train import init_train_state


def _cfg(**kw):
    return TrainConfig(dataset="tiny",
                       generator=GeneratorConfig(n_blocks=2, n_features_block=8,
                                                 n_features_last=16),
                       compute_dtype="float32",
                       replay=ReplayConfig(max_len=20, sample_ratio=0.1), **kw)


def test_auto_numbered_paths(tmp_path):
    root = str(tmp_path)
    p0 = next_write_path(root)
    assert p0.endswith("/0")
    open(p0, "w").close()
    assert next_write_path(root).endswith("/1")


def test_save_load_resume_roundtrip(tmp_path):
    cfg = _cfg()
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    ts["step"] = jnp.asarray(17, jnp.int32)
    payload = pack_train_state(ts, epoch=3, scale_factor=2,
                               replay_stack=np.zeros((2, 1, 4, 4, 3), np.float32))
    path = save_checkpoint(str(tmp_path), payload)
    assert os.path.exists(path)

    back = load_checkpoint(path)
    assert back["epoch"] == 3 and back["scale_factor"] == 2
    assert back["dis_list"].shape == (2, 1, 4, 4, 3)

    ts2 = init_train_state(jax.random.PRNGKey(42), cfg)  # different init
    ts2, reports = restore_train_state(ts2, back, verbose=False)
    assert reports["net_g"].coverage == 1.0
    assert reports["net_d"].coverage == 1.0
    assert int(ts2["step"]) == 17
    f1 = flatten_with_paths(ts["params_g"])
    f2 = flatten_with_paths(ts2["params_g"])
    for p in f1:
        np.testing.assert_array_equal(np.asarray(f1[p]), np.asarray(f2[p]), err_msg=p)
    # optimizer state restored exactly
    o1 = flatten_with_paths(ts["opt_g"])
    o2 = flatten_with_paths(ts2["opt_g"])
    for p in o1:
        np.testing.assert_array_equal(np.asarray(o1[p]), np.asarray(o2[p]), err_msg=p)


def test_unreadable_checkpoint_returns_empty(tmp_path):
    assert load_checkpoint(str(tmp_path / "nope")) == {}
    cfg = _cfg()
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    ts2, reports = restore_train_state(ts, {}, verbose=False)
    assert reports == {} and ts2 is ts


def test_progressive_transplant_x2_into_x4():
    """The reference's progressive_gan_suffix=2 flow: build the suffixed
    arch, then plant an x2 checkpoint under its 'base' subtree. Coverage
    must be partial with the suffix upscale exactly the missing set — and SN
    (u,v) state must transplant too (the reference's known-broken case,
    config.py:62)."""
    gcfg = GeneratorConfig(n_blocks=2, n_features_block=8, n_features_last=16)
    p2, s2 = generator_init(jax.random.PRNGKey(0), gcfg)

    gcfg4 = GeneratorConfig(n_blocks=2, n_features_block=8, n_features_last=16,
                            n_suffixes=1)
    p4, s4 = generator_init(jax.random.PRNGKey(1), gcfg4)

    merged, rep = transplant(p4, p2, target_prefix="base")
    assert 0.5 < rep.coverage < 1.0
    assert all(m.startswith("upscale/") for m in rep.missing), rep.missing
    assert rep.unused == ()
    # planted leaves equal the x2 values
    f2 = flatten_with_paths(p2)
    fm = flatten_with_paths(merged)
    for p in f2:
        np.testing.assert_array_equal(np.asarray(f2[p]), np.asarray(fm["base/" + p]))

    # SN/BN state transplants the same way (fixes reference config.py:62)
    ms, reps = transplant(s4, s2, target_prefix="base")
    assert reps.coverage > 0.5
    fs2 = flatten_with_paths(s2)
    fms = flatten_with_paths(ms)
    np.testing.assert_array_equal(np.asarray(fs2["first_layers/conv/u"]),
                                  np.asarray(fms["base/first_layers/conv/u"]))


def test_grow_then_transplant_equals_reference_flow():
    """progressive_gan_suffix=1 flow: load x2 -> grow a new suffix. The grown
    tree must contain the x2 params verbatim under 'base'."""
    gcfg = GeneratorConfig(n_blocks=2, n_features_block=8, n_features_last=16)
    p2, s2 = generator_init(jax.random.PRNGKey(0), gcfg)
    p4, s4 = grow_suffix(jax.random.PRNGKey(1), p2, s2, gcfg)
    f2 = flatten_with_paths(p2)
    f4 = flatten_with_paths(p4)
    for p in f2:
        np.testing.assert_array_equal(np.asarray(f2[p]), np.asarray(f4["base/" + p]))
    assert "upscale/conv/kernel" in f4


def test_transplant_shape_mismatch_skipped():
    a = {"w": jnp.zeros((2, 2)), "b": jnp.zeros(3)}
    b = {"w": np.ones((4, 4)), "b": np.ones(3)}
    merged, rep = transplant(a, b)
    assert rep.mismatched == ("w",)
    np.testing.assert_array_equal(np.asarray(merged["w"]), np.zeros((2, 2)))
    np.testing.assert_array_equal(np.asarray(merged["b"]), np.ones(3))
    assert "90" not in str(rep)  # smoke: report prints


def test_slim_checkpoint_resume_and_growth(tmp_path):
    """The VM-reset survival path the on-chip queue depends on
    (tools/slim_ckpt.py + tools/round3c_chain.sh): a slimmed checkpoint
    (G/D params+state only, no optimizer moments, dis_list=None) must
    (a) resume a same-scale finetune with fresh-optimizer fallback and
    (b) seed a progressive growth leg with full base coverage."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from slim_ckpt import slim

    cfg = _cfg()
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    ts["step"] = jnp.asarray(23, jnp.int32)
    payload = pack_train_state(ts, epoch=9, scale_factor=2,
                               replay_stack=np.zeros((2, 1, 4, 4, 3), np.float32))
    full = save_checkpoint(str(tmp_path), payload)
    slim_path = str(tmp_path / "keep.ckpt")
    slim(full, slim_path)
    assert os.path.getsize(slim_path) < os.path.getsize(full)

    back = load_checkpoint(slim_path)
    assert back["dis_list"] is None
    assert "opti_g" not in back and "opti_d" not in back
    assert back["epoch"] == 9 and back["step"] == 23

    from sisr_tpu.train.loop import assemble_state

    # (a) same-scale resume: params planted 100%, optimizer falls back fresh
    ts2, _, reports = assemble_state(jax.random.PRNGKey(1), cfg, back,
                                     verbose=False)
    assert reports["net_g"].coverage == 1.0
    assert reports["net_d"].coverage == 1.0
    assert int(ts2["step"]) == 23  # step survives the slim
    f1 = flatten_with_paths(ts["params_g"])
    f2 = flatten_with_paths(ts2["params_g"])
    for p in f1:
        np.testing.assert_array_equal(np.asarray(f1[p]), np.asarray(f2[p]),
                                      err_msg=p)

    # (b) growth leg (--progressive-suffix 1): base planted verbatim
    import dataclasses
    cfg_grow = dataclasses.replace(cfg, progressive_suffix=1)
    ts3, _, reports3 = assemble_state(jax.random.PRNGKey(2), cfg_grow, back,
                                      verbose=False)
    assert reports3["net_g"].coverage == 1.0  # pre-growth tree fully covered
    f3 = flatten_with_paths(ts3["params_g"])
    for p in f1:
        np.testing.assert_array_equal(np.asarray(f1[p]),
                                      np.asarray(f3["base/" + p]), err_msg=p)
    assert "upscale/conv/kernel" in f3  # the grown suffix exists

    # dis_list=None tolerated by both replay rings
    from sisr_tpu.train.replay import ReplayBuffer
    buf = ReplayBuffer(cfg.replay, (1, 4, 4, 3), seed=0)
    assert buf.load_state_dict(None, True) == 0
