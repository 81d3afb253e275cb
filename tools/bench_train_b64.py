"""Train throughput at batch 64 (VERDICT r4 next #6a).

The b16 headline (bench.py) is dispatch/efficiency-bound on the D ladder's
small-C_in stride-2 layers; batch scaling amortizes the per-layer
inefficiency (8.4 MP/s was observed at b64 in round 2's exploratory pass).
This captures the b64 point with the same fully-chained methodology as
bench.py (device_get-terminated reps, best-of-3, degraded retry) and
prints one JSON line:
  {"metric": "celeba_x4_train_mps_per_chip_b64", ...}

vs_baseline uses the SAME analytic A100 denominator as bench.py scaled to
b64 (the reference's per-step FLOPs scale linearly in batch, so its MP/s
is batch-independent to first order: 3.0 MP/s).

Run on an otherwise-idle chip (the round-5 post-chain window).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_A100_TRAIN_MPS = 3.0


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sisr_tpu.config import preset_x2_gan
    from sisr_tpu.models.vgg import VGGConfig, vgg_init
    from sisr_tpu.train import init_train_state
    from sisr_tpu.train.multi_step import init_replay_state, make_multi_step

    cfg = preset_x2_gan("celeba")
    cfg = dataclasses.replace(
        cfg,
        batch_size=64,
        generator=dataclasses.replace(cfg.generator, n_suffixes=1))
    assert cfg.scale_factor == 4
    hr_s, _ = cfg.geometry()
    batch = cfg.batch_size
    mp_per_batch = batch * hr_s[1] * hr_s[2] / 1e6

    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.uniform(-1, 1, (batch, hr_s[1], hr_s[2], hr_s[0]))
                     .astype(np.float32))

    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    vgg_params = vgg_init(jax.random.PRNGKey(1), VGGConfig(cfg.vgg_mask))
    K = 4  # fewer steps per call at b64: keeps the HR stack upload ~50 MB
    rs = init_replay_state(cfg, (batch, hr_s[1], hr_s[2], hr_s[0]))
    rs["n"] = jnp.asarray(cfg.replay.max_len, jnp.int32)
    fused = make_multi_step(cfg, total_steps=1000, k_steps=K, d_active=True,
                            g_adv_active=True, cont_kind="vgg",
                            vgg_params=vgg_params)
    hr_stack = jnp.broadcast_to(hr, (K,) + hr.shape)
    w = (jnp.float32(5e-2), jnp.float32(1.0), jnp.float32(1.0))

    print("[b64] compiling fused step (may take minutes cold)",
          file=sys.stderr, flush=True)
    m = None
    for _ in range(2):
        ts, rs, m = fused(ts, rs, hr_stack, hr_stack, w)
    _ = float(m["errD"][-1])

    iters = 3

    def measure():
        nonlocal ts, rs, m
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                ts, rs, m = fused(ts, rs, hr_stack, hr_stack, w)
            _ = float(m["errD"][-1])
            best = min(best, (time.perf_counter() - t0) / (iters * K))
        return best

    dt = measure()
    for _ in range(3):
        if mp_per_batch / dt >= 10.0:  # clearly healthy window
            break
        print("[b64] degraded read — retrying after 60 s", file=sys.stderr,
              flush=True)
        time.sleep(60)
        dt = min(dt, measure())

    mps = mp_per_batch / dt
    print(json.dumps({
        "metric": "celeba_x4_train_mps_per_chip_b64",
        "value": round(mps, 3), "unit": "megapixels/sec",
        "vs_baseline": round(mps / REF_A100_TRAIN_MPS, 3),
        "extras": {"train_ms_per_step": round(dt * 1e3, 3),
                   "batch": batch, "k_steps": K,
                   "device": str(jax.devices()[0])},
    }), flush=True)


if __name__ == "__main__":
    main()
