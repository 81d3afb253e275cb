"""Device validation + timing of the fused training-trunk kernel at the
canonical workload shape (B=16, LR 32x32, nf=64, 16 blocks).

1) correctness: fused vs unfused generator_apply (train mode, fp32) on the
   real chip — output and a full G-loss gradient;
2) timing: fused vs unfused G fwd+bwd (MSE loss), chained, bf16 compute.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sisr_tpu.config import GeneratorConfig
from sisr_tpu.models.generator import generator_apply, generator_init


def main():
    import dataclasses

    gcfg = GeneratorConfig(n_suffixes=1)
    gcfg_f = dataclasses.replace(gcfg, fused_trunk=True)
    params, state = generator_init(jax.random.PRNGKey(0), gcfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (16, 32, 32, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-1, 1, (16, 128, 128, 3))
                      .astype(np.float32))

    # ---- correctness on device: fp32 compute for tight comparison, at
    # half batch (fp32 scratches exceed the 128 MB VMEM at B=16) ----
    x8, tgt8 = x[:8], tgt[:8]

    def loss(p, cfg, cd):
        y, ns = generator_apply(p, state, x8, train=True, cfg=cfg,
                                compute_dtype=cd)
        return jnp.mean((y - tgt8) ** 2), (y, ns)

    vg = jax.jit(jax.value_and_grad(loss, has_aux=True),
                 static_argnums=(1, 2))
    (l_r, (y_r, _)), g_r = vg(params, gcfg, None)
    (l_f, (y_f, _)), g_f = vg(params, gcfg_f, None)
    dy = float(jnp.max(jnp.abs(y_f - y_r)))
    rel = []
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_r)):
        denom = float(jnp.max(jnp.abs(b))) + 1e-8
        rel.append(float(jnp.max(jnp.abs(a - b))) / denom)
    print(json.dumps({"max_abs_dy": dy, "max_rel_dgrad": max(rel),
                      "loss_ref": float(l_r), "loss_fused": float(l_f)}),
          flush=True)

    # ---- timing (bf16 compute like production) ----
    def timed(cfg, iters=40):
        def step(p, xx):
            def loss_(p):
                y, _ = generator_apply(p, state, xx, train=True, cfg=cfg,
                                       compute_dtype=jnp.bfloat16)
                return jnp.mean((y - tgt) ** 2)
            l, g = jax.value_and_grad(loss_)(p)
            # chain: fold the loss AND a grad reduction back into the input
            # so calls serialize and the backward can't be DCE'd away
            gsum = sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(g))
            return l, xx + ((l + gsum) * 0).astype(xx.dtype)

        f = jax.jit(step)
        xx = x
        l = None
        for _ in range(5):
            l, xx = f(params, xx)
        _ = float(l)
        t0 = time.perf_counter()
        for _ in range(iters):
            l, xx = f(params, xx)
        _ = float(l)
        return (time.perf_counter() - t0) / iters

    dt_ref = timed(gcfg)
    dt_fus = timed(gcfg_f)
    print(json.dumps({"g_fwd_bwd_ms_unfused": round(dt_ref * 1e3, 3),
                      "g_fwd_bwd_ms_fused": round(dt_fus * 1e3, 3),
                      "speedup": round(dt_ref / dt_fus, 2)}))


if __name__ == "__main__":
    main()
