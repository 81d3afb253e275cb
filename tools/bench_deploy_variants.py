"""Measure the deploy-mode SR path with each kernel combination on the real
chip: XLA-only vs pallas trunk vs pallas fused-upscale vs both, at batch 16
and 64. Chained-loop timing with a terminal device_get (see CLAUDE.md
benchmark methodology).

Usage: python tools/bench_deploy_variants.py
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

from sisr_tpu.config import preset_x2_gan
from sisr_tpu.infer import make_deploy_fn
from sisr_tpu.models.generator import generator_init


def chained_time(fn, x0, iters, warm=5):
    @jax.jit
    def chained(x):
        y = fn(x)
        return x + (jnp.mean(y) * 0).astype(x.dtype)

    x = x0
    for _ in range(warm):
        x = chained(x)
    _ = float(jnp.sum(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = chained(x)
    _ = float(jnp.sum(x))
    return (time.perf_counter() - t0) / iters


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 64],
                    help="serving batch sizes to sweep")
    ap.add_argument("--variants", nargs="+",
                    default=["xla", "trunk", "upscale", "both", "int8",
                             "int8_fp_ends"])
    args = ap.parse_args()

    cfg = preset_x2_gan("celeba")
    cfg = dataclasses.replace(
        cfg, generator=dataclasses.replace(cfg.generator, n_suffixes=1))
    hr_s, lr_s = cfg.geometry()
    params, state = generator_init(jax.random.PRNGKey(0), cfg.generator)
    rng = np.random.default_rng(0)

    results = {}
    for batch in args.batches:
        lr = jnp.asarray(
            rng.uniform(-1, 1, (batch, lr_s[1], lr_s[2], lr_s[0]))
            .astype(np.float32))
        mp = batch * hr_s[1] * hr_s[2] / 1e6
        all_variants = {
            "xla": (False, False),
            "trunk": (True, False),
            "upscale": (False, True),
            "both": (True, True),
        }
        for name in args.variants:
            if name in all_variants:
                pt, pu = all_variants[name]
                fn = make_deploy_fn(params, state, cfg.generator,
                                    use_pallas_trunk=pt,
                                    use_pallas_upscale=pu,
                                    compute_dtype=jnp.bfloat16)
            elif name in ("int8", "int8_fp_ends"):
                from sisr_tpu.quant import make_deploy_fn_int8
                keep = (frozenset({"stem", "end", "upscale"})
                        if name == "int8_fp_ends" else frozenset())
                fn = make_deploy_fn_int8(params, state, cfg.generator,
                                         keep_fp=keep)
            else:
                raise SystemExit(f"unknown variant {name}")
            dt = chained_time(fn, lr, iters=60)
            results[f"b{batch}_{name}"] = {
                "ms_per_batch": round(dt * 1e3, 3),
                "mps": round(mp / dt, 1),
            }
            print(json.dumps({f"b{batch}_{name}": results[f"b{batch}_{name}"]}),
                  flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
