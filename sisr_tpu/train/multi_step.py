"""Compiled multi-step driver: K train iterations in one lax.scan.

The single-step path pays a host dispatch round trip per iteration (a few
ms through the remote runtime). With the device-resident replay ring the
entire training state lives in HBM, so K iterations can run as ONE compiled
program: the scan body is the full GAN step plus in-graph replay
sample/store. The host only feeds K stacked batches and reads K stacked
metrics.

Semantics are identical to K sequential single steps with
DeviceReplayBuffer (same sampling distribution, same store cadence), except
PRNG streams: the fused driver derives per-iteration keys by fold_in.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from sisr_tpu.config import TrainConfig
from sisr_tpu.train.replay_device import replay_sample, replay_store
from sisr_tpu.train.step import make_train_step


def init_replay_state(cfg: TrainConfig, batch_shape, seed: int = 0):
    """{stack, n, key, it} carry for the fused driver."""
    return {
        "stack": jnp.zeros((max(cfg.replay.max_len, 1),) + tuple(batch_shape),
                           jnp.bfloat16),
        "n": jnp.zeros((), jnp.int32),
        "key": jax.random.PRNGKey(seed),
        "it": jnp.zeros((), jnp.int32),
    }


def make_multi_step(cfg: TrainConfig, total_steps: int, *, k_steps: int,
                    d_active: bool, g_adv_active: bool,
                    cont_kind: Optional[str], vgg_params=None, mask_g=None,
                    sched_step0: int = 0, mesh=None):
    """fused(ts, replay_state, hr_stack, hr_d_stack, weights, data=None) ->
    (ts, replay_state, metrics-stacked-over-K).

    hr_stack / hr_d_stack: (K, B, H, W, C) — or (K, B) int32 index stacks
    into `data` when the corpus is device-resident (cfg.device_data).
    `data` is an explicit jit argument (never a closure: a closed-over
    multi-GB device array becomes a captured lowering constant that each
    compiled variant re-ships and double-pins in HBM). With `mesh`
    (cfg.device_data requires the mesh caller to always pass `data`
    positionally so the in_shardings arity matches), the driver runs
    data-parallel under GSPMD: batches and the replay ring sharded on their
    batch dim, train state replicated — the same recipe as
    parallel.mesh.shard_train_step, composed with the K-step scan (the
    reference's DataParallel applies to its production loop, config.py:
    114-118, so the fused production driver must shard too).
    """
    inner = make_train_step(cfg, total_steps, d_active=d_active,
                            g_adv_active=g_adv_active, cont_kind=cont_kind,
                            vgg_params=vgg_params, mask_g=mask_g, jit=False,
                            sched_step0=sched_step0)
    r = max(cfg.replay.max_samples, 1)
    ratio = cfg.replay.sample_ratio
    max_len = max(cfg.replay.max_len, 1)
    freq = cfg.replay.save_freq

    def make_body(data):
        def body(carry, xs):
            ts, rs = carry
            hr, hr_d, weights = xs
            key = jax.random.fold_in(rs["key"], rs["it"])
            k_samp, k_store = jax.random.split(key)
            stack, mask = replay_sample(rs["stack"], rs["n"], k_samp, r,
                                        ratio)
            if cfg.replay.max_samples == 0:
                stack, mask = stack[:0], mask[:0]
            ts, fake, metrics = inner(ts, hr, hr_d, stack, mask, weights,
                                      data)

            # store only while D updates run (reference stores inside the
            # `if lw_adv_d:` branch, train.py:59-71) — pre-GAN epochs must
            # not pre-fill the ring
            if cfg.replay.max_len == 0 or not d_active:
                new_stack, new_n = rs["stack"], rs["n"]
            elif freq == 1:  # canonical config: store every iteration
                new_stack, new_n = replay_store(rs["stack"], rs["n"],
                                                k_store, fake, max_len)
            else:
                do_store = rs["it"] % freq == 0
                stored, n_stored = replay_store(rs["stack"], rs["n"],
                                                k_store, fake, max_len)
                new_stack = jnp.where(do_store, stored, rs["stack"])
                new_n = jnp.where(do_store, n_stored, rs["n"])
            rs = {"stack": new_stack, "n": new_n, "key": rs["key"],
                  "it": rs["it"] + 1}
            return (ts, rs), metrics
        return body

    def fused(ts, replay_state, hr_stack, hr_d_stack, weights, data=None):
        w = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (k_steps,) + jnp.shape(x)), weights)
        (ts, rs), metrics = lax.scan(make_body(data), (ts, replay_state),
                                     (hr_stack, hr_d_stack, w))
        return ts, rs, metrics

    if mesh is None:
        return jax.jit(fused, donate_argnums=(0, 1))

    from sisr_tpu.parallel.mesh import batch_sharded, replicated
    repl = replicated(mesh)
    b1 = batch_sharded(mesh, 1)   # (K, B, ...) and (max_len, B, ...): dim 1
    rs_shard = {"stack": b1, "n": repl, "key": repl, "it": repl}
    in_sh = (repl, rs_shard, b1, b1, repl)
    if cfg.device_data:
        in_sh = in_sh + (repl,)  # mesh callers always pass `data` then
    return jax.jit(fused,
                   in_shardings=in_sh,
                   out_shardings=(repl, rs_shard, repl),
                   donate_argnums=(0, 1))
