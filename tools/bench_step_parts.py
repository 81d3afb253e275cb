"""Decompose the GAN step time by toggling components (real chip).

Variants of the fused K-step driver (steady-state replay where D is on):
  full        D + adv-G + VGG content     (the bench workload)
  no_vgg      D + adv-G, content off
  no_d        adv-G off, D off, VGG content on  (G fwd/bwd + VGG only)
  mse_only    identity content only            (G fwd/bwd + MSE)
Differences isolate the D+replay block and the VGG block; mse_only bounds
the G fwd+bwd cost that the pallas trunk targets.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from sisr_tpu.config import preset_x2_gan
    from sisr_tpu.models.vgg import VGGConfig, vgg_init
    from sisr_tpu.train import init_train_state
    from sisr_tpu.train.multi_step import init_replay_state, make_multi_step

    cfg = preset_x2_gan("celeba")
    cfg = dataclasses.replace(
        cfg, generator=dataclasses.replace(cfg.generator, n_suffixes=1))
    hr_s, _ = cfg.geometry()
    batch = cfg.batch_size
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.uniform(-1, 1, (batch, hr_s[1], hr_s[2], hr_s[0]))
                     .astype(np.float32))
    vgg_params = vgg_init(jax.random.PRNGKey(1), VGGConfig(cfg.vgg_mask))
    K = 8
    hr_stack = jnp.broadcast_to(hr, (K,) + hr.shape)

    variants = {
        "full": dict(d_active=True, g_adv_active=True, cont_kind="vgg"),
        "no_vgg": dict(d_active=True, g_adv_active=True, cont_kind=None),
        "d_only": dict(d_active=True, g_adv_active=False, cont_kind=None),
        "gadv_only": dict(d_active=False, g_adv_active=True, cont_kind=None),
        "no_d": dict(d_active=False, g_adv_active=False, cont_kind="vgg"),
        "mse_only": dict(d_active=False, g_adv_active=False,
                         cont_kind="identity"),
    }
    out = {}
    for name, kw in variants.items():
        ts = init_train_state(jax.random.PRNGKey(0), cfg)
        rs = init_replay_state(cfg, (batch, hr_s[1], hr_s[2], hr_s[0]))
        rs["n"] = jnp.asarray(cfg.replay.max_len, jnp.int32)
        fused = make_multi_step(
            cfg, total_steps=1000, k_steps=K,
            vgg_params=vgg_params if kw["cont_kind"] == "vgg" else None, **kw)
        w = (jnp.float32(5e-2), jnp.float32(1.0), jnp.float32(1.0))
        m = None
        for _ in range(2):
            ts, rs, m = fused(ts, rs, hr_stack, hr_stack, w)
        _ = float(m["errG_cont"][-1])
        iters = 6
        t0 = time.perf_counter()
        for _ in range(iters):
            ts, rs, m = fused(ts, rs, hr_stack, hr_stack, w)
        _ = float(m["errG_cont"][-1])
        ms = (time.perf_counter() - t0) / (iters * K) * 1e3
        out[name] = round(ms, 2)
        print(json.dumps({name: out[name]}), flush=True)
    out["d_replay_block_ms"] = round(out["full"] - out["no_d"], 2)
    out["vgg_block_ms"] = round(out["full"] - out["no_vgg"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
