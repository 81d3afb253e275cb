"""Data pipeline split semantics + end-to-end training loop smoke
(reference gen_dataset config.py:202-277 and train_loop train.py:21-125)."""
import numpy as np
import pytest

import jax

from sisr_tpu.config import (
    INF,
    GeneratorConfig,
    LossWindows,
    ReplayConfig,
    TrainConfig,
)
from sisr_tpu.data.pipeline import BatchLoader, DoubleLoader, SyntheticDataset, build_data
from sisr_tpu.train.loop import assemble_state, effective_generator_cfg, train


def _cfg(**kw):
    base = dict(
        dataset="tiny",
        generator=GeneratorConfig(n_blocks=2, n_features_block=8,
                                  n_features_last=16),
        compute_dtype="float32", batch_size=4, num_epochs=1, n_batch=4,
        lr=1e-3, lr_decay=False,
        replay=ReplayConfig(max_len=20, sample_ratio=0.1),
        windows=LossWindows(adv_g=(0, 0), adv_d=(0, 0), content=(0, 0),
                            identity=(0, INF)),
    )
    base.update(kw)
    return TrainConfig(**base)


def test_synthetic_dataset_deterministic():
    ds = SyntheticDataset((3, 16, 16), 8)
    a, b = ds[3], ds[3]
    np.testing.assert_array_equal(a, b)
    assert a.shape == (16, 16, 3)
    assert a.min() >= -1 and a.max() <= 1
    assert not np.allclose(ds[3], ds[4])


def test_split_semantics_supervised():
    cfg = _cfg(n_batch=-1)
    loader, (test_hr, test_lr), n_batch = build_data(cfg, synthetic_len=37)
    # n = (37-4)//2 = 16 -> 32 train images -> 8 batches of 4
    assert n_batch == 8 and len(loader) == 8
    hr, hr_d = next(iter(loader))
    assert hr.shape == (4, 16, 16, 3)
    np.testing.assert_array_equal(hr, hr_d)  # supervised pairs are identical
    assert test_hr.shape == (4, 16, 16, 3)
    assert test_lr.shape == (4, 8, 8, 3)
    # test batch = last batch_size images (reference config.py:271)
    ds = SyntheticDataset((3, 16, 16), 37)
    np.testing.assert_array_equal(test_hr[-1], ds[36])


def test_split_semantics_unsupervised():
    cfg = _cfg(content_loss_on_lr=True, n_batch=-1,
               windows=LossWindows(adv_g=(0, 0), adv_d=(0, 0),
                                   content=(0, 0), identity=(0, INF)))
    loader, _, n_batch = build_data(cfg, synthetic_len=37)
    assert isinstance(loader, DoubleLoader)
    assert n_batch == 4  # n=16 -> each half 16 imgs -> 4 batches
    h1, h2 = next(iter(loader))
    assert not np.allclose(h1, h2)  # disjoint halves


def test_device_data_build_yields_index_batches():
    """cfg.device_data: loaders yield (B,) int32 indices into the attached
    materialized corpus; corpus[idx] reproduces the plain fp32 batches and
    the held-out test batch is untouched."""
    cfg = _cfg(n_batch=-1, device_data=True)
    loader, (test_hr, _), n_batch = build_data(cfg, synthetic_len=37)
    corpus = loader.device_corpus
    assert corpus is not None and corpus.shape == (32, 16, 16, 3)

    plain_loader, (test_hr_p, _), n_p = build_data(_cfg(n_batch=-1),
                                                   synthetic_len=37)
    assert n_batch == n_p
    np.testing.assert_array_equal(test_hr, test_hr_p)
    for (i1, i2), (h1, h2) in zip(loader, plain_loader):
        assert i1.dtype == np.int32 and i1.shape == (4,)
        np.testing.assert_array_equal(i1, i2)  # supervised: same indices
        np.testing.assert_array_equal(corpus[i1], h1)
        np.testing.assert_array_equal(corpus[i2], h2)


def test_device_data_loop_matches_plain(tmp_path):
    """End-to-end: training with the device-resident corpus must reproduce
    the plain-transport run (same seed) on both the per-step and the fused
    K-step driver."""
    import dataclasses

    r_plain = train(_cfg(seed=7), save=False, synthetic_len=40,
                    verbose=False)
    r_dev = train(_cfg(seed=7, device_data=True), save=False,
                  synthetic_len=40, verbose=False)
    np.testing.assert_allclose(r_dev.losses["cont"], r_plain.losses["cont"],
                               rtol=1e-6)
    np.testing.assert_allclose(r_dev.metrics["psnr"], r_plain.metrics["psnr"],
                               rtol=1e-6)

    ring = ReplayConfig(max_len=20, sample_ratio=0.1, host_offload=False)
    rf_plain = train(_cfg(seed=7, fused_steps=2, replay=ring), save=False,
                     synthetic_len=40, verbose=False)
    rf_dev = train(_cfg(seed=7, fused_steps=2, replay=ring,
                        device_data=True), save=False, synthetic_len=40,
                   verbose=False)
    np.testing.assert_allclose(rf_dev.losses["cont"], rf_plain.losses["cont"],
                               rtol=1e-6)


def test_drop_last():
    ds = SyntheticDataset((3, 16, 16), 10)
    loader = BatchLoader(ds, range(10), 4)
    batches = list(loader)
    assert len(batches) == 2  # 10 // 4, remainder dropped


def test_end_to_end_loop_mse(tmp_path):
    cfg = _cfg(write_root=str(tmp_path) + "/")
    res = train(cfg, save=True, synthetic_len=40, verbose=False)
    # n_batch=4: 3 trained batches (last is snapshot-only, reference quirk)
    assert len(res.losses["cont"]) == 3
    assert int(res.ts["step"]) == 3
    # snapshots: plot_first + epoch end
    assert len(res.img_list) == 2
    assert res.write_path is not None
    assert np.isfinite(res.metrics["psnr"])
    # checkpoint is loadable and resumes at the right epoch
    from sisr_tpu.checkpoint import load_checkpoint
    ck = load_checkpoint(res.write_path)
    assert ck["epoch"] == 1 and ck["scale_factor"] == 2


def test_end_to_end_progressive_grow(tmp_path):
    """x2 train -> checkpoint -> progressive_suffix=1 (grow to x4) with
    frozen prefix — the reference's flagship workflow (README.md:67-73)."""
    cfg2 = _cfg(write_root=str(tmp_path) + "/")
    res2 = train(cfg2, save=True, synthetic_len=40, verbose=False)

    from sisr_tpu.checkpoint import load_checkpoint
    ck = load_checkpoint(res2.write_path)

    cfg4 = _cfg(write_root=str(tmp_path) + "/", progressive_suffix=1,
                freeze_prefix=True, dataset="tiny")
    assert cfg4.scale_factor == 4
    gcfg = effective_generator_cfg(cfg4)
    assert gcfg.n_suffixes == 1

    from sisr_tpu.nn.pytree import flatten_with_paths
    ts, mask_g, reports = assemble_state(jax.random.PRNGKey(0), cfg4, ck,
                                         verbose=False)
    # transplanted x2 weights live under base/ verbatim
    f2 = flatten_with_paths(ck["net_g"]["params"])
    f4 = flatten_with_paths(ts["params_g"])
    np.testing.assert_array_equal(np.asarray(f2["first_layers/conv/kernel"]),
                                  np.asarray(f4["base/first_layers/conv/kernel"]))
    assert mask_g is not None

    res4 = train(cfg4, checkpoint=ck, save=False, synthetic_len=40,
                 verbose=False)
    assert np.isfinite(res4.metrics["psnr"])
    # frozen prefix unchanged by the finetune
    f4b = flatten_with_paths(res4.ts["params_g"])
    np.testing.assert_array_equal(
        np.asarray(f2["first_layers/conv/kernel"]),
        np.asarray(f4b["base/first_layers/conv/kernel"]))


def test_progressive_continue_already_grown(tmp_path):
    """Resuming an ALREADY-grown checkpoint uses the even suffix (2 for x4,
    4 for x8): the arch is built at full depth BEFORE load so every key
    lands (reference config.py:83-96, progressive_gan_suffix >= 2 wraps
    before torch.load). The odd suffix on the same checkpoint rebuilds a
    fresh base and transplants ~0% of it — the failure mode this test
    pins down."""
    from sisr_tpu.checkpoint import load_checkpoint
    from sisr_tpu.nn.pytree import flatten_with_paths

    res2 = train(_cfg(write_root=str(tmp_path) + "/"), save=True,
                 synthetic_len=40, verbose=False)
    ck2 = load_checkpoint(res2.write_path)
    res4 = train(_cfg(write_root=str(tmp_path) + "/", progressive_suffix=1),
                 checkpoint=ck2, save=True, synthetic_len=40, verbose=False)
    ck4 = load_checkpoint(res4.write_path)  # already-grown x4 checkpoint

    # correct wiring: suffix 2 = wrap before load -> 100% transplant
    cfg_cont = _cfg(progressive_suffix=2)
    assert cfg_cont.scale_factor == 4
    ts, _, reports = assemble_state(jax.random.PRNGKey(1), cfg_cont, ck4,
                                    verbose=False)
    rp = reports["net_g"]
    assert rp.coverage == 1.0
    assert not rp.missing and not rp.mismatched
    f_ck = flatten_with_paths(ck4["net_g"]["params"])
    f_ts = flatten_with_paths(ts["params_g"])
    assert set(f_ck) == set(f_ts)
    for k in f_ck:
        np.testing.assert_array_equal(np.asarray(f_ck[k]),
                                      np.asarray(f_ts[k]))

    # wrong wiring: suffix 1 grows a FRESH stage after loading into a bare
    # base — the grown checkpoint's nested base/* keys can't land
    _, _, bad = assemble_state(jax.random.PRNGKey(1),
                               _cfg(progressive_suffix=1), ck4,
                               verbose=False)
    assert bad["net_g"].coverage < 0.5
    assert bad["net_g"].unused  # base/* keys of ck4 had nowhere to go


def test_end_to_end_unsupervised(tmp_path):
    cfg = _cfg(content_loss_on_lr=True, write_root=str(tmp_path) + "/",
               windows=LossWindows(adv_g=(0, INF), adv_d=(0, INF),
                                   content=(0, 0), identity=(0, INF)))
    res = train(cfg, save=False, synthetic_len=40, verbose=False)
    assert np.isfinite(res.metrics["psnr"])
    assert len(res.losses["D"]) > 0 and res.losses["D"][0] > 0


def test_mnist_one_channel_flow():
    """Reference config.py:80: generator input channels follow the dataset;
    1-channel data uses the identity extractor (config.py:100-104)."""
    import dataclasses
    from sisr_tpu.config import preset_x2_mse
    cfg = preset_x2_mse("mnist", num_epochs=1, n_batch=3, batch_size=4,
                        seed=1, compute_dtype="float32",
                        d_features=(8, 16), d_strides=(1, 2))
    cfg = dataclasses.replace(
        cfg, generator=GeneratorConfig(n_blocks=2, n_features_block=8,
                                       n_features_last=16))
    r = train(cfg, save=False, synthetic_len=40, verbose=False)
    assert np.isfinite(r.metrics["psnr"])
    assert r.img_list[0][0].shape[-1] == 1


def test_resume_continues_epoch_count(tmp_path):
    """Resume: epoch numbering continues from the checkpoint (reference
    starting_epoch, config.py:317-318)."""
    cfg = _cfg(write_root=str(tmp_path) + "/")
    r1 = train(cfg, save=True, synthetic_len=40, verbose=False)
    from sisr_tpu.checkpoint import load_checkpoint
    ck = load_checkpoint(r1.write_path)
    assert ck["epoch"] == 1
    r2 = train(cfg, checkpoint=ck, save=True, synthetic_len=40, verbose=False)
    ck2 = load_checkpoint(r2.write_path)
    assert ck2["epoch"] == 2
    # optimizer step counter carried on
    assert int(r2.ts["step"]) == 6


def test_device_replay_loop(tmp_path):
    """host_offload=False: HBM-resident replay ring through the full loop."""
    import dataclasses
    cfg = _cfg(write_root=str(tmp_path) + "/",
               windows=LossWindows(),  # D active so replay is exercised
               replay=ReplayConfig(max_len=10, sample_ratio=0.2,
                                   host_offload=False))
    res = train(cfg, save=True, synthetic_len=40, verbose=False)
    assert np.isfinite(res.metrics["psnr"])
    from sisr_tpu.checkpoint import load_checkpoint
    ck = load_checkpoint(res.write_path)
    assert ck["dis_list"] is not None and len(ck["dis_list"]) == 3


def test_replay_store_gated_on_adv_d(tmp_path):
    """A pre-GAN identity epoch must not pre-fill the replay ring: the
    reference stores fakes inside the `if lw_adv_d:` branch only
    (train.py:59-71)."""
    cfg = _cfg(write_root=str(tmp_path) + "/",
               windows=LossWindows(adv_g=(1, INF), adv_d=(1, INF),
                                   content=(1, INF), identity=(0, 1)),
               replay=ReplayConfig(max_len=10, sample_ratio=0.2))
    res = train(cfg, save=True, synthetic_len=40, verbose=False)
    from sisr_tpu.checkpoint import load_checkpoint
    ck = load_checkpoint(res.write_path)
    assert ck["dis_list"] is None or len(ck["dis_list"]) == 0


def test_mnist_vgg_window_remaps_to_identity():
    """1-channel data resolves the content ('vgg') window to the identity
    extractor at the content weight 1.0*f (reference config.py:100-104 +
    gen_losses) instead of crashing on missing vgg_params."""
    import dataclasses
    from sisr_tpu.config import preset_x2_gan
    cfg = preset_x2_gan("mnist", num_epochs=1, n_batch=3, batch_size=4,
                        seed=1, compute_dtype="float32",
                        d_features=(8, 16), d_strides=(1, 2),
                        replay=ReplayConfig(max_len=10, sample_ratio=0.1))
    cfg = dataclasses.replace(cfg, generator=GeneratorConfig(
        n_blocks=2, n_features_block=8, n_features_last=16))
    w_ag, w_ad, w_c, ck = cfg.epoch_weights(0)
    assert ck == "identity" and w_c == 1.0
    r = train(cfg, save=False, synthetic_len=40, verbose=False)
    assert np.isfinite(r.metrics["psnr"])


def test_batchloader_propagates_producer_exception():
    """A dataset error in the prefetch thread must raise in the consumer,
    not leave it blocked on q.get() forever (failure-tolerance contract)."""
    class Exploding:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("boom at 5")
            return np.zeros((4, 4, 3), np.float32)

    loader = BatchLoader(Exploding(), range(8), 2)
    got = []
    with pytest.raises(RuntimeError, match="boom at 5"):
        for b in loader:
            got.append(b)
    assert len(got) == 2  # batches [0,1] and [2,3] arrived before the error
