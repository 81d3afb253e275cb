"""The jitted GAN training step — the framework's hot loop.

One call replicates one iteration of the reference's per-batch loop
(reference train.py:32-122):

  LR synthesis -> G forward (train mode) ->
  [D update: BCE(D(real), 0.9) + BCE(D(fake.detach), 0)
             + sum of masked replay-slot BCE terms]            (train.py:128-168)
  [G update: w_adv_g * BCE(D(fake), 1.0)
             + w_cont * mean((E(target) - E(fake))^2)]         (train.py:171-186)
  both LR schedules advance by global step                     (train.py:121-122)

Static specialization: `make_train_step` closes over which loss terms are
active this epoch (d_active, g_adv_active, cont_kind) — the host picks the
right compiled variant per epoch from the LossWindows schedule, exactly
mirroring the reference's `if lw_*:` branches. The *weights* stay traced
scalars so a variant is compiled at most once.

Unsupervised ("no-HR" / AmbientGAN) mode (reference train.py:41-50,95-97):
`hr` drives LR synthesis and the content target; `hr_d` (a disjoint dataset
half) is what D sees as real; the content loss compares E(lr) with
E(lr_from_hr(fake)). In supervised mode the host passes hr_d = hr.

Faithfulness notes (deliberate, documented divergences):
- D-update forwards run sequentially (real -> current fake -> live replay
  slots) with BN running stats chained through in slot order — exact
  reference semantics. Dead replay slots are skipped via lax.cond, so a
  cold buffer costs nothing.
- SN power iteration runs once per D update (on the real-batch forward) and
  once in the G update's D forward, instead of once per *every* forward;
  SN updates are input-independent so this only changes iteration count.
- BCE is computed from logits (exact same value as BCELoss∘sigmoid).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from sisr_tpu.config import TrainConfig
from sisr_tpu.models.discriminator import (
    discriminator_apply,
    discriminator_features,
    discriminator_init,
)
from sisr_tpu.models.generator import generator_apply, generator_init
from sisr_tpu.models.vgg import VGGConfig, vgg_apply
from sisr_tpu.ops.resize import device_normalize, lr_from_hr
from sisr_tpu.train.losses import bce_with_logits, content_loss
from sisr_tpu.train.optim import adam_update, make_adam, make_lr_schedule

TrainState = Dict[str, Any]  # params_g/state_g/opt_g/params_d/state_d/opt_d/step


def init_train_state(key, cfg: TrainConfig) -> TrainState:
    kg, kd = jax.random.split(key)
    params_g, state_g = generator_init(kg, cfg.generator)
    dis_cfg = cfg.discriminator()
    params_d, state_d = discriminator_init(kd, dis_cfg)
    adam = make_adam(cfg.adam_b1, cfg.adam_b2)
    return {
        "params_g": params_g, "state_g": state_g, "opt_g": adam.init(params_g),
        "params_d": params_d, "state_d": state_d, "opt_d": adam.init(params_d),
        "step": jnp.zeros((), jnp.int32),
    }


def make_train_step(cfg: TrainConfig, total_steps: int, *,
                    d_active: bool, g_adv_active: bool,
                    cont_kind: Optional[str], vgg_params=None,
                    mask_g=None, jit: bool = True, sched_step0: int = 0):
    """Build one compiled variant of the train step.

    cont_kind: 'vgg' | 'dfeat' | 'identity' | None. `mask_g` is a trainable-mask
    pytree for the generator (progressive freezing); None = all trainable.
    `sched_step0`: the run's starting global step — the LR schedule decays
    from (step - sched_step0), so resumed runs restart the decay at full
    base LR like the reference, which rebuilds LambdaLR each run
    (config.py:170-180), while the global step counter itself continues.
    Returns step(ts, hr, hr_d, replay, replay_mask, weights, data=None) ->
    (ts, fake, metrics). `data` is the optional device-resident train
    corpus (N, H, W, C): when passed, `hr`/`hr_d` are int32 index vectors
    gathered from it on device — steady-state h2d drops from the full
    batch to B*4 bytes/step (cfg.device_data). It is an explicit jit
    ARGUMENT, not a closure: closing over a multi-GB device array embeds
    it as a captured lowering constant, which every compiled variant
    re-ships through the relay and pins a second HBM copy of.
    """
    gen_cfg = cfg.generator
    dis_cfg = cfg.discriminator()
    vgg_cfg = VGGConfig(cfg.vgg_mask)
    hr_shape, lr_shape = cfg.geometry()
    lr_hw = (lr_shape[1], lr_shape[2])
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    sched = make_lr_schedule(cfg.lr, total_steps, cfg.lr_decay)
    adam = make_adam(cfg.adam_b1, cfg.adam_b2)
    unsup = cfg.content_loss_on_lr
    if cont_kind == "vgg" and vgg_params is None:
        raise ValueError("cont_kind='vgg' requires vgg_params")
    if cont_kind == "dfeat":
        n_blocks_d = len(dis_cfg.list_n_features) - 1
        if not cfg.dfeat_taps or max(cfg.dfeat_taps) >= n_blocks_d:
            raise ValueError(
                f"dfeat_taps {cfg.dfeat_taps} out of range for the "
                f"{n_blocks_d}-block discriminator ladder")

    g_apply = functools.partial(generator_apply, cfg=gen_cfg, compute_dtype=cd)
    d_apply = functools.partial(discriminator_apply, cfg=dis_cfg, compute_dtype=cd,
                                return_logits=True)

    def extract(x, params_d=None, state_d=None):
        if cont_kind == "vgg":
            return vgg_apply(vgg_params, x, vgg_cfg, compute_dtype=cd)
        if cont_kind == "dfeat":
            # D-feature matching (the egress-free perceptual loss): L2 on
            # the discriminator's own intermediate activations. D params
            # are a constant of the G update (the loss differentiates
            # w.r.t. the fake image only) — like VGG, gradients flow
            # through the activations, not into the extractor's weights.
            return discriminator_features(params_d, state_d, x, cfg=dis_cfg,
                                          taps=cfg.dfeat_taps,
                                          compute_dtype=cd)
        return x.astype(jnp.float32).reshape(x.shape[0], -1)

    def step_fn(ts: TrainState, hr, hr_d, replay, replay_mask, weights,
                data=None):
        w_adv_g, w_adv_d, w_cont = weights
        lr_t = sched(ts["step"] - sched_step0)
        # device-resident corpus: hr/hr_d arrive as int32 index vectors;
        # gather the batch from HBM instead of uploading it
        if data is not None:
            hr = jnp.take(data, hr, axis=0)
            hr_d = jnp.take(data, hr_d, axis=0)
        # uint8 transport: file-dataset batches may arrive as raw uint8
        # (4x less h2d than fp32 — the relay retains every unique upload,
        # BENCH_NOTES round 5); normalization moves on-device with the
        # same expression the host pipeline uses (u8/255 * 2 - 1).
        hr = device_normalize(hr)
        hr_d = device_normalize(hr_d)  # XLA CSEs the duplicate when hr_d==hr
        img_lr = lr_from_hr(hr, lr_hw)

        # ONE G forward per step, exactly like the reference (train.py:53
        # computes `fake` once and reuses the same tensor for the D update
        # and the G backward): jax.vjp keeps the residuals so the G gradient
        # can be pulled back later through d(loss)/d(fake).
        g_needs_grad = g_adv_active or cont_kind is not None
        if g_needs_grad:
            fake, g_vjp, state_g_fwd = jax.vjp(
                lambda p: g_apply(p, ts["state_g"], img_lr, train=True),
                ts["params_g"], has_aux=True)
        else:
            fake, state_g_fwd = g_apply(ts["params_g"], ts["state_g"],
                                        img_lr, train=True)
        fake = lax.stop_gradient(fake)
        state_g_fwd = lax.stop_gradient(state_g_fwd)

        zero = jnp.zeros((), jnp.float32)
        metrics = {"errD": zero, "errG_adv": zero, "errG_cont": zero,
                   "D_x": zero, "D_G_z1": zero, "D_G_z2": zero}

        # ------------------------------------------------------ D update
        if d_active:
            from sisr_tpu.models.discriminator import discriminator_sn_update

            def d_loss_fn(params_d):
                # ALL of the D update's forwards — real, current fake, and
                # the replay slots — run as ONE vmapped batched pass
                # (effective batch (R+2)*B keeps the MXU fed; a
                # cond-in-scan formulation costs ~30 ms/step and separate
                # b16 real/fake passes run at single-digit TF/s).
                # Exactness:
                # - SN power iteration is input-independent, so the
                #   per-forward iteration hoists to one standalone update
                #   whose (u, v) all slots then share (sn_train=False);
                # - train-mode BN normalizes by per-slot batch stats, which
                #   never read the running stats — the vmapped losses equal
                #   the reference's sequential forwards bit-for-bit;
                # - each live slot adds a full (summed, not averaged) BCE
                #   term (reference train.py:141-166);
                # - running stats are re-chained in slot order [real, fake,
                #   replay...] in closed form below.
                st0 = discriminator_sn_update(params_d, ts["state_d"])
                slots = jnp.concatenate(
                    [hr_d[None].astype(jnp.float32),
                     fake[None].astype(jnp.float32),
                     lax.stop_gradient(replay)], axis=0)
                smask = jnp.concatenate([jnp.ones((2,)), replay_mask])

                d_out, st_slots = jax.vmap(
                    lambda xb: d_apply(params_d, st0, xb, train=True,
                                       sn_train=False))(slots)
                loss = bce_with_logits(d_out[0], 0.9)  # one-sided smoothing
                fake_bce = jax.vmap(
                    lambda l: bce_with_logits(l, 0.0))(d_out[1:])
                loss = loss + jnp.sum(fake_bce * smask[1:])
                probs = jax.nn.sigmoid(d_out)
                d_x = jnp.mean(probs[0])
                dgz1 = jnp.sum(jnp.mean(probs[1:], axis=1) * smask[1:])

                # closed-form sequential chaining of state updates:
                # new_i = (1-m)*old + m*stat_i (all computed from the shared
                # st0 under vmap) => run' = (1-m)*run + new_i - (1-m)*old.
                # The rule is a no-op for leaves the forward left unchanged
                # (SN u/v), so it applies uniformly; dead slots are skipped.
                m_bn = 0.1  # BatchNorm momentum (torch default)

                def chain(old_leaf, new_leaves):
                    def body(run, i):
                        upd = ((1 - m_bn) * run + new_leaves[i]
                               - (1 - m_bn) * old_leaf)
                        return jnp.where(smask[i] > 0, upd, run), None
                    out, _ = lax.scan(body, old_leaf,
                                      jnp.arange(slots.shape[0]))
                    return out

                st = jax.tree_util.tree_map(chain, st0, st_slots)
                # summed over fakes, then scaled (reference train.py:76)
                loss = loss * w_adv_d
                return loss, (st, d_x, dgz1)

            (errD, (state_d_new, d_x, dgz1)), grads_d = jax.value_and_grad(
                d_loss_fn, has_aux=True)(ts["params_d"])
            params_d_new, opt_d_new = adam_update(
                adam, ts["opt_d"], grads_d, ts["params_d"], lr_t)
            metrics.update(errD=errD, D_x=d_x, D_G_z1=dgz1)
        else:
            params_d_new, opt_d_new = ts["params_d"], ts["opt_d"]
            state_d_new = ts["state_d"]

        # ------------------------------------------------------ G update
        if g_needs_grad:
            # loss as a function of the fake IMAGE; the G param gradient is
            # then one pullback through the saved G residuals (g_vjp).
            def fake_loss_fn(fake_img):
                st_d = state_d_new
                loss = jnp.zeros((), jnp.float32)
                err_adv = jnp.zeros((), jnp.float32)
                dgz2 = jnp.zeros((), jnp.float32)
                if g_adv_active:
                    # D sees the freshly-updated params (reference updates D
                    # first, then computes G's adv loss, train.py:87)
                    d_out, st_d = d_apply(params_d_new, st_d, fake_img, train=True)
                    err_adv = w_adv_g * bce_with_logits(d_out, 1.0)
                    dgz2 = jnp.mean(jax.nn.sigmoid(d_out))
                    loss = loss + err_adv
                err_cont = jnp.zeros((), jnp.float32)
                if cont_kind is not None:
                    # dfeat reads the freshly-updated D (like adv-G above);
                    # its BN runs in eval mode so state_d_new is not touched
                    ex = functools.partial(extract, params_d=params_d_new,
                                           state_d=state_d_new)
                    if unsup:
                        fake_lr = lr_from_hr(fake_img, lr_hw)
                        err_cont = w_cont * content_loss(ex(img_lr),
                                                         ex(fake_lr))
                    else:
                        err_cont = w_cont * content_loss(ex(hr),
                                                         ex(fake_img))
                    loss = loss + err_cont
                return loss, (st_d, err_adv, err_cont, dgz2)

            (_, (state_d_new, err_adv, err_cont, dgz2)), d_fake_img = \
                jax.value_and_grad(fake_loss_fn, has_aux=True)(fake)
            (grads_g,) = g_vjp(d_fake_img)
            state_g_new = state_g_fwd
            params_g_new, opt_g_new = adam_update(
                adam, ts["opt_g"], grads_g, ts["params_g"], lr_t, mask=mask_g)
            metrics.update(errG_adv=err_adv, errG_cont=err_cont, D_G_z2=dgz2)
        else:
            params_g_new, opt_g_new = ts["params_g"], ts["opt_g"]
            state_g_new = state_g_fwd

        new_ts = {
            "params_g": params_g_new, "state_g": state_g_new, "opt_g": opt_g_new,
            "params_d": params_d_new, "state_d": state_d_new, "opt_d": opt_d_new,
            "step": ts["step"] + 1,
        }
        return new_ts, fake, metrics

    if jit:
        return jax.jit(step_fn, donate_argnums=(0,))
    return step_fn


def epoch_step_builder(cfg: TrainConfig, total_steps: int, vgg_params=None,
                       mask_g=None, jit: bool = True, mesh=None,
                       sched_step0: int = 0):
    """Cache of compiled step variants keyed by the epoch's active losses.

    Host-side analog of the reference's per-epoch `if lw_*` gating
    (train.py:55-105): call `get(epoch)` to obtain (step_fn, weights).
    With a mesh, each variant is wrapped data-parallel instead of plain jit.
    """
    cache: Dict[Tuple[bool, bool, Optional[str]], Any] = {}

    def get(epoch: int):
        w_adv_g, w_adv_d, w_cont, cont_kind = cfg.epoch_weights(epoch)
        key = (w_adv_d > 0, w_adv_g > 0, cont_kind)
        if key not in cache:
            fn = make_train_step(
                cfg, total_steps, d_active=key[0], g_adv_active=key[1],
                cont_kind=cont_kind, vgg_params=vgg_params, mask_g=mask_g,
                jit=jit and mesh is None, sched_step0=sched_step0)
            if mesh is not None:
                from sisr_tpu.parallel.mesh import shard_train_step
                fn = shard_train_step(fn, mesh,
                                      with_data=cfg.device_data)
            cache[key] = fn
        weights = (jnp.asarray(w_adv_g, jnp.float32),
                   jnp.asarray(w_adv_d, jnp.float32),
                   jnp.asarray(w_cont, jnp.float32))
        return cache[key], weights

    return get
