"""Training orchestration: the imperative shell around the jitted step.

Replicates the reference's experiment assembly (config.py:334-346) and
training loop (train.py:21-125) without import-time side effects or
interactive prompts:

- seeding: explicit seed or a printed random draw from [1, 10000]
  (reference gen_seed, config.py:192-198);
- progressive wiring via `progressive_suffix` 0..4 exactly as reference
  config.py:18-21,83-96: {0,2,4} build the (suffixed) arch then load the
  checkpoint; {1,3} load first and then grow a fresh suffix;
- per-epoch loss gating through compiled step variants;
- replay buffer store/sample around every step (train.py:59-71);
- the reference's loop quirks kept: the last batch of each epoch is used
  for the visual snapshot and then skipped (train.py:35-38), `plot_first`
  snapshots before training, stats printed every n_batch//10 iterations,
  per-iteration loss histories, and the final "train loop in N s" print;
- epoch-end additions the reference lacks: PSNR/SSIM on the held-out test
  batch (BASELINE.md requirement).
"""
from __future__ import annotations

import dataclasses
import random
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sisr_tpu.checkpoint import (
    pack_train_state,
    restore_train_state,
    save_checkpoint,
    transplant,
)
from sisr_tpu.config import GeneratorConfig, TrainConfig
from sisr_tpu.metrics import psnr, ssim
from sisr_tpu.models.discriminator import discriminator_init
from sisr_tpu.models.generator import (
    generator_apply,
    generator_freeze_prefixes,
    generator_init,
    grow_suffix,
)
from sisr_tpu.models.vgg import VGGConfig, vgg_init
from sisr_tpu.train.optim import make_adam, trainable_mask
from sisr_tpu.train.replay import ReplayBuffer
from sisr_tpu.train.step import epoch_step_builder
from sisr_tpu.data.pipeline import build_data


_PRE_SUFFIXES = {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}  # arch built before load
_GROW_AFTER = {1, 3}                              # grow a new stage post-load


def resolve_seed(seed: Optional[int]) -> int:
    if seed is None:
        seed = random.randint(1, 10000)
    print("Random Seed: ", seed)
    return seed


def effective_generator_cfg(cfg: TrainConfig) -> GeneratorConfig:
    """Final (post-growth) generator architecture. Input channels follow the
    dataset geometry (reference config.py:80:
    Generator(input_channels=image_size_lr[0]) — 1 for mnist, 3 otherwise)."""
    hr_s, _ = cfg.geometry()
    gen = dataclasses.replace(cfg.generator, input_channels=hr_s[0])
    if cfg.progressive_suffix is None:
        return gen
    n = _PRE_SUFFIXES[cfg.progressive_suffix] + (
        1 if cfg.progressive_suffix in _GROW_AFTER else 0)
    return dataclasses.replace(gen, n_suffixes=n)


def assemble_state(key, cfg: TrainConfig, checkpoint: Dict,
                   verbose: bool = True):
    """Build G/D/optimizers with checkpoint restore + progressive growth.

    Returns (ts, mask_g, reports). Mirrors reference gen_modules
    (config.py:77-120) + gen_optimizers (config.py:292-304).
    """
    kg, kd, kgrow = jax.random.split(key, 3)
    ps = cfg.progressive_suffix
    final_gen = effective_generator_cfg(cfg)

    pre_gen = final_gen if ps is None else dataclasses.replace(
        final_gen, n_suffixes=_PRE_SUFFIXES[ps])
    params_g, state_g = generator_init(kg, pre_gen)

    reports = {}
    grown = ps in _GROW_AFTER if ps is not None else False
    if checkpoint:
        params_g, rp = transplant(params_g, checkpoint["net_g"]["params"])
        state_g, _ = transplant(state_g, checkpoint["net_g"]["state"])
        reports["net_g"] = rp
        if verbose:
            print("[net_g]", rp, sep="\n")
    if grown:
        params_g, state_g = grow_suffix(kgrow, params_g, state_g, cfg.generator)

    dis_cfg = cfg.discriminator()
    params_d, state_d = discriminator_init(kd, dis_cfg)
    if checkpoint:
        params_d, rd = transplant(params_d, checkpoint["net_d"]["params"])
        state_d, _ = transplant(state_d, checkpoint["net_d"]["state"])
        reports["net_d"] = rd

    adam = make_adam(cfg.adam_b1, cfg.adam_b2)
    ts = {
        "params_g": params_g, "state_g": state_g, "opt_g": adam.init(params_g),
        "params_d": params_d, "state_d": state_d, "opt_d": adam.init(params_d),
        "step": jnp.zeros((), jnp.int32),
    }
    if checkpoint and not grown:
        ts, _ = restore_train_state(
            ts, {k: checkpoint[k] for k in ("opti_g", "opti_d", "step")
                 if k in checkpoint}, verbose=verbose)

    mask_g = None
    if cfg.freeze_prefix and final_gen.n_suffixes > 0:
        prefixes = generator_freeze_prefixes(
            final_gen.n_suffixes, freeze_upscale=cfg.freeze_upscale,
            freeze_end=cfg.freeze_end)
        mask_g = trainable_mask(params_g, prefixes)
    return ts, mask_g, reports


def make_infer_fn(cfg: TrainConfig, gen_cfg):
    """Jitted generator forward for snapshots/eval. Train-mode BN (batch
    stats), exactly like the reference which never calls .eval()
    (train.py/visualisation.py); state updates discarded."""
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    @jax.jit
    def fwd(params, state, x):
        y, _ = generator_apply(params, state, x, train=True, cfg=gen_cfg,
                               compute_dtype=cd)
        return y

    return fwd


def snapshot(infer_fn, ts, test_lr, test_hr, plot_usr: bool):
    """Epoch-boundary visual snapshot (reference save_curr_vis,
    utils.py:50-62): G on the first 4 test LR images (+ the 4 HR images as
    'UR' when small enough)."""
    out = [np.asarray(infer_fn(ts["params_g"], ts["state_g"],
                               jnp.asarray(test_lr[:4])))]
    if plot_usr:
        out.append(np.asarray(infer_fn(ts["params_g"], ts["state_g"],
                                       jnp.asarray(test_hr[:4]))))
    return tuple(out)


@dataclasses.dataclass
class TrainResult:
    ts: Any
    losses: Dict[str, List[float]]
    img_list: List[Tuple[np.ndarray, ...]]
    write_path: Optional[str]
    metrics: Dict[str, float]
    test_batch: Tuple[np.ndarray, np.ndarray]


def train(cfg: TrainConfig, checkpoint: Optional[Dict] = None,
          mesh=None, save: bool = True, plot_first: bool = True,
          synthetic_len: int = 512, verbose: bool = True) -> TrainResult:
    """Full training run. `checkpoint` is a loaded payload dict (or None).

    NOTE: the payload dict is CLEARED once its contents are transplanted
    (params/optimizers into `ts`, dis_list into the replay buffer) so the
    multi-hundred-MB unpickled blob isn't pinned for the whole run; pass a
    copy if the caller needs it afterwards."""
    checkpoint = checkpoint or {}
    seed = resolve_seed(cfg.seed)
    key = jax.random.PRNGKey(seed)
    key, k_state, k_vgg = jax.random.split(key, 3)

    gen_cfg = effective_generator_cfg(cfg)
    hr_s, lr_s = cfg.geometry()
    starting_epoch = int(checkpoint.get("epoch", 0))

    loader, (test_hr, test_lr), n_batch = build_data(cfg, synthetic_len)
    total_steps = n_batch * cfg.num_epochs

    # device-resident corpus (cfg.device_data): one upload, then every
    # step gathers its batch from HBM by index — steady-state h2d drops
    # to 4 bytes/image and the relay's per-upload host retention stops
    # growing with epochs (BENCH_NOTES round 5)
    data_dev = None
    if getattr(loader, "device_corpus", None) is not None:
        if mesh is not None:
            from sisr_tpu.parallel.mesh import replicated
            data_dev = jax.device_put(loader.device_corpus, replicated(mesh))
        else:
            data_dev = jnp.asarray(loader.device_corpus)
        data_dev.block_until_ready()
        loader.device_corpus = None  # release the host copy

    ts, mask_g, _ = assemble_state(k_state, cfg, checkpoint, verbose=verbose)

    # content extractor: MaskedVGG for RGB, identity for 1-channel data
    # (reference config.py:100-104); vgg weights from cfg.vgg_weights (npz)
    # or fixed-seed random fallback
    vgg_params = None
    if hr_s[0] == 3 and cfg.content_extractor == "vgg":
        src = cfg.vgg_weights if cfg.vgg_weights else k_vgg
        if not cfg.vgg_weights and verbose:
            print("[vgg] no pretrained weights configured — fixed random "
                  "extractor (see tools/port_vgg_weights.py, or "
                  "--content-extractor dfeat for the egress-free learned "
                  "perceptual loss)")
        elif cfg.vgg_weights and verbose:
            print(f"[vgg] pretrained weights loaded from {cfg.vgg_weights}")
        vgg_params = vgg_init(src, VGGConfig(cfg.vgg_mask))

    # LR decay restarts at full base LR each run (reference rebuilds LambdaLR
    # per run, config.py:170-180) even though the global step counter resumes
    sched_step0 = int(ts["step"])
    get_step = epoch_step_builder(cfg, total_steps, vgg_params=vgg_params,
                                  mask_g=mask_g, jit=mesh is None, mesh=mesh,
                                  sched_step0=sched_step0)

    # replay: restore only when the generated-image scale matches
    # (reference config.py:323-331). host_offload picks the reference's
    # dis_list_old_cpu mode: True = host numpy ring (+ per-step device_put),
    # False = HBM-resident ring (train/replay_device.py).
    buf_cls = ReplayBuffer
    if not cfg.replay.host_offload:
        from sisr_tpu.train.replay_device import DeviceReplayBuffer
        buf_cls = DeviceReplayBuffer
    buf = buf_cls(cfg.replay, (cfg.batch_size, hr_s[1], hr_s[2], hr_s[0]),
                  seed=seed)
    scale_ok = checkpoint.get("scale_factor") == cfg.scale_factor
    n_restored = buf.load_state_dict(checkpoint.get("dis_list"), scale_ok)
    if verbose and checkpoint:
        print(f"replay: restored {n_restored} old generated batches")
    # Release the payload: everything needed has been transplanted into
    # `ts` and the replay buffer, but this long-lived frame would otherwise
    # pin the whole unpickled dict — params, both optimizer states, and up
    # to 1000 replay batches (~0.5-3.5 GB) — for the entire run
    # (VERDICT r4 next #7: resumed-leg host memory).
    checkpoint.clear()

    infer_fn = make_infer_fn(cfg, gen_cfg)
    plot_usr = cfg.scale_factor * hr_s[1] < 1024  # reference config.py:346
    losses: Dict[str, List[float]] = {"D": [], "G": [], "cont": []}
    img_list: List[Tuple[np.ndarray, ...]] = []
    print_period = max(1, n_batch // 10)

    # fused K-step driver (cfg.fused_steps > 0): requires the device ring
    fused_cache: Dict = {}
    if cfg.fused_steps > 0:
        from sisr_tpu.train.multi_step import make_multi_step
        from sisr_tpu.train.replay_device import DeviceReplayBuffer
        if not isinstance(buf, DeviceReplayBuffer):
            raise ValueError("fused_steps requires replay.host_offload=False "
                             "(HBM-resident replay ring)")

        def get_fused(epoch):
            w_ag, w_ad, w_c, ck = cfg.epoch_weights(epoch)
            key = (w_ad > 0, w_ag > 0, ck)
            if key not in fused_cache:
                fused_cache[key] = make_multi_step(
                    cfg, total_steps, k_steps=cfg.fused_steps,
                    d_active=key[0], g_adv_active=key[1], cont_kind=ck,
                    vgg_params=vgg_params, mask_g=mask_g,
                    sched_step0=sched_step0, mesh=mesh)
            return fused_cache[key]

    def emit(i, epoch, m, idx=None):
        # m must already be host-side (one device_get per step/chunk —
        # per-scalar float() syncs cost ~0.1 s each through a remote runtime)
        get = (lambda k: float(m[k][idx])) if idx is not None \
            else (lambda k: float(m[k]))
        if i % print_period == 0 and verbose:
            print("[%d/%d][%d/%d]\tLoss_D: %.4f\tLoss_G_adv: %.4f\t"
                  "Loss_G_con: %.4f\tD(x): %.4f\tD(G(z)): %.4f / %.4f"
                  % (epoch, cfg.num_epochs + starting_epoch, i, n_batch,
                     get("errD"), get("errG_adv"), get("errG_cont"),
                     get("D_x"), get("D_G_z1"), get("D_G_z2")))
        losses["G"].append(get("errG_adv"))
        losses["D"].append(get("errD"))
        losses["cont"].append(get("errG_cont"))

    # Device-resident test batch: the epoch-end metrics and snapshots reuse
    # these every epoch; re-uploading them each time costs ~100 ms/epoch of
    # H2D through the remote relay (~150 MB/s).
    test_lr_dev = jnp.asarray(test_lr)
    test_hr_dev = jnp.asarray(test_hr)

    # Lazy metric pipeline. Through the remote relay each device_get drains
    # the dispatch queue, so fetching metrics right after every fused call
    # serializes the next chunk's H2D behind the current chunk's compute
    # (~2-8x wall-clock on long runs). Keeping a bounded backlog of
    # un-fetched metric pytrees lets the host run ahead and overlap uploads
    # with device compute; prints/loss-history order is preserved, lines
    # just appear up to METRIC_LAG_CHUNKS*K steps late.
    METRIC_LAG_CHUNKS = 4
    # (epoch, [step indices], device metrics, stacked-over-K?)
    pending: List = []
    rs_live = None               # replay scan-state threaded across chunks

    def flush_pending(force: bool = False):
        while pending and (force or len(pending) > METRIC_LAG_CHUNKS):
            ep, idxs, m, stacked = pending.pop(0)
            m_host = jax.device_get(m)
            if stacked:
                for k, i in enumerate(idxs):
                    emit(i, ep, m_host, idx=k)
            else:
                emit(idxs[0], ep, m_host)

    def sync_buf():
        # re-materialize the replay ring object from the threaded scan-state
        # before any non-fused use of `buf` (partial chunks, persistence)
        nonlocal rs_live
        if rs_live is not None:
            buf.load_scan_state(rs_live)
            rs_live = None

    t0 = time.time()
    it_global = 0
    p = s = float("nan")
    for epoch in range(starting_epoch, starting_epoch + cfg.num_epochs):
        step_fn, weights = get_step(epoch)
        d_active_epoch = cfg.epoch_weights(epoch)[1] > 0
        chunk: List = []

        def run_single(hr, hr_d, i, epoch):
            nonlocal ts, it_global
            stack, mask = buf.sample()
            hr_dev = jnp.asarray(hr)
            hrd_dev = hr_dev if hr_d is hr else jnp.asarray(hr_d)
            # device-resident corpus rides as an explicit argument (same
            # device buffer every call — zero h2d, never a captured
            # constant); sharded steps built with with_data=True require it
            step_args = (ts, hr_dev, hrd_dev, jnp.asarray(stack),
                         jnp.asarray(mask), weights)
            if data_dev is not None:
                step_args = step_args + (data_dev,)
            ts, fake, m = step_fn(*step_args)
            # fakes enter the replay ring only while D updates run — the
            # reference stores inside the `if lw_adv_d:` branch
            # (train.py:59-71), so MSE-pretrain epochs must not pre-fill
            # the buffer with pre-GAN fakes
            if d_active_epoch:
                # host buffer needs the fake on host (reference's .cpu()
                # offload, train.py:59-61); the device buffer keeps it in HBM
                buf.maybe_store(it_global,
                                np.asarray(fake) if cfg.replay.host_offload
                                else fake)
            it_global += 1
            pending.append((epoch, [i], m, False))
            flush_pending()

        def flush_chunk(epoch):
            nonlocal ts, it_global, chunk, rs_live
            if not chunk:
                return
            if len(chunk) == cfg.fused_steps:
                fused = get_fused(epoch)
                hr_stack = jnp.asarray(np.stack([c[1] for c in chunk]))
                if all(c[2] is c[1] for c in chunk):
                    # supervised mode: hr_d IS hr (data/pipeline._Paired) —
                    # don't upload the same 25 MB stack twice
                    hrd_stack = hr_stack
                else:
                    hrd_stack = jnp.asarray(np.stack([c[2] for c in chunk]))
                rs = rs_live if rs_live is not None \
                    else buf.as_scan_state(it_global)
                if data_dev is not None:
                    ts, rs_live, m = fused(ts, rs, hr_stack, hrd_stack,
                                           weights, data_dev)
                else:
                    ts, rs_live, m = fused(ts, rs, hr_stack, hrd_stack,
                                           weights)
                pending.append((epoch, [i for i, _, _ in chunk], m, True))
                flush_pending()
                it_global += len(chunk)
            else:  # leftover partial chunk: per-step path
                sync_buf()
                for i, hr, hr_d in chunk:
                    run_single(hr, hr_d, i, epoch)
            chunk = []

        for i, (hr, hr_d) in enumerate(loader):
            # plot_first fires at absolute epoch 0 only (reference
            # train.py:35: `epoch == 0`) — checkpoint-resumed runs get no
            # extra pre-training snapshot
            if i == n_batch - 1 or (plot_first and epoch == 0 and i == 0):
                flush_chunk(epoch)
                img_list.append(snapshot(infer_fn, ts, test_lr_dev,
                                         test_hr_dev, plot_usr))
                if i == n_batch - 1:
                    break  # reference skips training the snapshot batch

            if cfg.fused_steps > 0:
                chunk.append((i, hr, hr_d))
                if len(chunk) == cfg.fused_steps:
                    flush_chunk(epoch)
            else:
                run_single(hr, hr_d, i, epoch)
        flush_chunk(epoch)
        flush_pending(force=True)

        # epoch-end quality metrics (not in reference; README.md:88 TODO)
        sr_test = infer_fn(ts["params_g"], ts["state_g"], test_lr_dev)
        p = float(psnr(sr_test, test_hr_dev))
        s = float(ssim(sr_test, test_hr_dev))
        if verbose:
            print(f"[epoch {epoch}] test PSNR {p:.2f} dB  SSIM {s:.4f}")

    sync_buf()
    if verbose:
        print("train loop in", time.time() - t0)

    write_path = None
    if save:
        payload = pack_train_state(
            ts, epoch=starting_epoch + cfg.num_epochs,
            scale_factor=cfg.scale_factor,
            replay_stack=buf.state_dict() if cfg.replay.persist else None)
        write_path = save_checkpoint(cfg.write_root, payload)
        if verbose:
            print("network saved to", write_path)

    metrics = {"psnr": p, "ssim": s}
    return TrainResult(ts=ts, losses=losses, img_list=img_list,
                       write_path=write_path, metrics=metrics,
                       test_batch=(test_hr, test_lr))
