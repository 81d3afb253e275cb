"""Multi-chip DP scaling evidence within this environment's limits
(VERDICT r1 item 9): run the sharded GAN step on virtual CPU meshes of
1/2/4/8 devices at fixed PER-DEVICE batch (weak scaling), record compile +
execute, and compute the ICI all-reduce volume per step analytically from
the real model sizes.

CPU wall-clock is NOT TPU performance — the point is that the sharded
program (grad all-reduce + global sync-BN) compiles and executes at every
mesh size, and what the collectives would carry on ICI.

Must run as a fresh process (provisions the forced-CPU backend).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                           + os.environ.get("XLA_FLAGS", ""))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    import dataclasses

    from sisr_tpu.config import (GeneratorConfig, ReplayConfig, TrainConfig,
                                 preset_x2_gan)
    from sisr_tpu.parallel import make_mesh, shard_batch, shard_train_step
    from sisr_tpu.train import init_train_state, make_train_step

    # ---- analytic ICI volume at the real celeba-x4 workload ----
    real = preset_x2_gan("celeba")
    real = dataclasses.replace(
        real, generator=dataclasses.replace(real.generator, n_suffixes=1))
    ts_real = init_train_state(jax.random.PRNGKey(0), real)
    n_g = sum(x.size for x in jax.tree_util.tree_leaves(ts_real["params_g"]))
    n_d = sum(x.size for x in jax.tree_util.tree_leaves(ts_real["params_d"]))
    del ts_real
    # ring all-reduce moves 2*(N-1)/N * bytes; fp32 grads
    vol = {}
    for n in (2, 4, 8):
        factor = 2 * (n - 1) / n
        vol[f"allreduce_MB_per_step_n{n}"] = round(
            factor * 4 * (n_g + n_d) / 1e6, 1)

    # ---- weak-scaling execution on the virtual mesh ----
    cfg = TrainConfig(
        dataset="tiny",
        generator=GeneratorConfig(n_blocks=2, n_features_block=8,
                                  n_features_last=16),
        compute_dtype="float32", lr=1e-3, lr_decay=False,
        replay=ReplayConfig(max_len=10, sample_ratio=0.1))
    hr_s, _ = cfg.geometry()
    per_dev = 2
    R = cfg.replay.max_samples
    rng = np.random.default_rng(0)
    results = {"params_g": n_g, "params_d": n_d, **vol}
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        b = per_dev * n
        ts = init_train_state(jax.random.PRNGKey(0), cfg)
        raw = make_train_step(cfg, 100, d_active=True, g_adv_active=True,
                              cont_kind="identity", jit=False)
        step = shard_train_step(raw, mesh)
        hr = shard_batch(mesh, jnp.asarray(
            rng.uniform(-1, 1, (b, hr_s[1], hr_s[2], hr_s[0]))
            .astype(np.float32)))
        replay = jnp.asarray(
            rng.uniform(-1, 1, (R, b, hr_s[1], hr_s[2], hr_s[0]))
            .astype(np.float32))
        rmask = jnp.asarray(np.ones((R,), np.float32))
        w = (jnp.float32(5e-2), jnp.float32(1.0), jnp.float32(10.0))
        t0 = time.perf_counter()
        ts, fake, m = step(ts, hr, hr, replay, rmask, w)
        _ = float(m["errD"])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            ts, fake, m = step(ts, hr, hr, replay, rmask, w)
        _ = float(m["errD"])
        exec_ms = (time.perf_counter() - t0) / iters * 1e3
        results[f"mesh{n}"] = {
            "global_batch": b, "compile_s": round(compile_s, 1),
            "exec_ms_cpu": round(exec_ms, 1),
            "errD": round(float(m["errD"]), 4),
            "fake_sharding": str(fake.sharding.spec),
        }
        print(json.dumps({f"mesh{n}": results[f"mesh{n}"]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
