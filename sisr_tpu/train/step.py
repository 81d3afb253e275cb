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
from sisr_tpu.models.discriminator import discriminator_apply, discriminator_init
from sisr_tpu.models.generator import generator_apply, generator_init
from sisr_tpu.models.vgg import VGGConfig, vgg_apply
from sisr_tpu.ops.resize import lr_from_hr
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
                    mask_g=None, jit: bool = True):
    """Build one compiled variant of the train step.

    cont_kind: 'vgg' | 'identity' | None. `mask_g` is a trainable-mask
    pytree for the generator (progressive freezing); None = all trainable.
    Returns step(ts, hr, hr_d, replay, replay_mask, weights) ->
    (ts, fake, metrics).
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

    g_apply = functools.partial(generator_apply, cfg=gen_cfg, compute_dtype=cd)
    d_apply = functools.partial(discriminator_apply, cfg=dis_cfg, compute_dtype=cd,
                                return_logits=True)

    def extract(x):
        if cont_kind == "vgg":
            return vgg_apply(vgg_params, x, vgg_cfg, compute_dtype=cd)
        return x.astype(jnp.float32).reshape(x.shape[0], -1)

    def step_fn(ts: TrainState, hr, hr_d, replay, replay_mask, weights):
        w_adv_g, w_adv_d, w_cont = weights
        lr_t = sched(ts["step"])
        img_lr = lr_from_hr(hr, lr_hw)

        # G forward in train mode: produces the fake batch and (if no G loss
        # is active this epoch) the G state advance (reference train.py:53).
        fake, state_g_fwd = g_apply(ts["params_g"], ts["state_g"], img_lr, train=True)
        fake = lax.stop_gradient(fake)
        state_g_fwd = lax.stop_gradient(state_g_fwd)

        zero = jnp.zeros((), jnp.float32)
        metrics = {"errD": zero, "errG_adv": zero, "errG_cont": zero,
                   "D_x": zero, "D_G_z1": zero, "D_G_z2": zero}

        # ------------------------------------------------------ D update
        if d_active:
            def d_loss_fn(params_d):
                st = ts["state_d"]
                d_real, st = d_apply(params_d, st, hr_d, train=True)
                loss = bce_with_logits(d_real, 0.9)  # one-sided smoothing
                d_x = jnp.mean(jax.nn.sigmoid(d_real))

                d_fake, st = d_apply(params_d, st, fake, train=True, sn_train=False)
                loss = loss + bce_with_logits(d_fake, 0.0)
                dgz1 = jnp.mean(jax.nn.sigmoid(d_fake))

                def scan_body(carry, xs):
                    st, loss, dgz = carry
                    fb, live = xs

                    def live_fn(op):
                        st, loss, dgz = op
                        d_o, st2 = d_apply(params_d, st, fb, train=True,
                                           sn_train=False)
                        return (st2, loss + bce_with_logits(d_o, 0.0),
                                dgz + jnp.mean(jax.nn.sigmoid(d_o)))

                    carry = lax.cond(live > 0, live_fn, lambda op: op,
                                     (st, loss, dgz))
                    return carry, None

                (st, loss, dgz1), _ = lax.scan(
                    scan_body, (st, loss, dgz1), (replay, replay_mask))
                # summed (not averaged) over fakes, then scaled
                # (reference train.py:76 `errD *= lw_adv_d`)
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
        if g_adv_active or cont_kind is not None:
            def g_loss_fn(params_g):
                fake2, st_g = g_apply(params_g, ts["state_g"], img_lr, train=True)
                st_d = state_d_new
                loss = jnp.zeros((), jnp.float32)
                err_adv = jnp.zeros((), jnp.float32)
                dgz2 = jnp.zeros((), jnp.float32)
                if g_adv_active:
                    # D sees the freshly-updated params (reference updates D
                    # first, then computes G's adv loss, train.py:87)
                    d_out, st_d = d_apply(params_d_new, st_d, fake2, train=True)
                    err_adv = w_adv_g * bce_with_logits(d_out, 1.0)
                    dgz2 = jnp.mean(jax.nn.sigmoid(d_out))
                    loss = loss + err_adv
                err_cont = jnp.zeros((), jnp.float32)
                if cont_kind is not None:
                    if unsup:
                        fake_lr = lr_from_hr(fake2, lr_hw)
                        err_cont = w_cont * content_loss(extract(img_lr),
                                                         extract(fake_lr))
                    else:
                        err_cont = w_cont * content_loss(extract(hr), extract(fake2))
                    loss = loss + err_cont
                return loss, (st_g, st_d, err_adv, err_cont, dgz2)

            (_, (state_g_new, state_d_new, err_adv, err_cont, dgz2)), grads_g = \
                jax.value_and_grad(g_loss_fn, has_aux=True)(ts["params_g"])
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
                       mask_g=None, jit: bool = True, mesh=None):
    """Cache of compiled step variants keyed by the epoch's active losses.

    Host-side analog of the reference's per-epoch `if lw_*` gating
    (train.py:55-105): call `get(epoch)` to obtain (step_fn, weights).
    With a mesh, each variant is wrapped data-parallel instead of plain jit.
    """
    cache: Dict[Tuple[bool, bool, Optional[str]], Any] = {}

    def get(epoch: int):
        w_adv_g, w_adv_d, w_cont, cont_kind = cfg.windows.weights(
            epoch, cfg.content_loss_on_lr)
        key = (w_adv_d > 0, w_adv_g > 0, cont_kind)
        if key not in cache:
            fn = make_train_step(
                cfg, total_steps, d_active=key[0], g_adv_active=key[1],
                cont_kind=cont_kind, vgg_params=vgg_params, mask_g=mask_g,
                jit=jit and mesh is None)
            if mesh is not None:
                from sisr_tpu.parallel.mesh import shard_train_step
                fn = shard_train_step(fn, mesh)
            cache[key] = fn
        weights = (jnp.asarray(w_adv_g, jnp.float32),
                   jnp.asarray(w_adv_d, jnp.float32),
                   jnp.asarray(w_cont, jnp.float32))
        return cache[key], weights

    return get
