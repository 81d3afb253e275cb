"""Per-layer cost of the discriminator ladder at the D-update's effective
batch (12 slots x batch 16 = 192), fwd+bwd, on the real chip.

Identifies which layers starve the MXU. Chained-loop timing, one device_get.
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
from jax import lax


def conv(x, w, stride):
    return lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        window_strides=(stride, stride), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def timed(fn, *args, iters=30, warm=3):
    f = jax.jit(fn)
    out = None
    for _ in range(warm):
        out = f(*args)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out[1]) if isinstance(out, tuple) else jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        args = (args[0], *args[1:])
        out = f(*args)
    _ = float(jnp.sum(out[1]) if isinstance(out, tuple) else jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    B = 192
    ladder = [  # (Hin, Cin, Cout, stride)
        (128, 3, 64, 1),
        (128, 64, 64, 2),
        (64, 64, 128, 1),
        (64, 128, 128, 2),
        (32, 128, 256, 1),
        (32, 256, 256, 2),
        (16, 256, 512, 1),
        (16, 512, 512, 2),
    ]
    rng = np.random.default_rng(0)
    results = {}
    total = 0.0
    for li, (hin, cin, cout, s) in enumerate(ladder):
        x = jnp.asarray(rng.normal(0, 1, (B, hin, hin, cin))
                        .astype(np.float32))
        w = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cout))
                        .astype(np.float32))

        def fwd_bwd(x, w):
            def loss(w):
                y = conv(x, w, s)
                return jnp.sum(y.astype(jnp.float32) ** 2), y
            (l, y), gw = jax.value_and_grad(loss, has_aux=True)(w)
            return l, y

        def fwd_bwd_dx(x, w):
            def loss(x, w):
                y = conv(x, w, s)
                return jnp.sum(y.astype(jnp.float32) ** 2), y
            (l, y), g = jax.value_and_grad(loss, argnums=(0, 1),
                                           has_aux=True)(x, w)
            return l, y

        hout = hin // s
        gf = 2 * B * hout * hout * 9 * cin * cout / 1e9
        dt_w = timed(fwd_bwd, x, w)
        dt_full = timed(fwd_bwd_dx, x, w)
        results[f"l{li}_{hin}x{cin}->{cout}s{s}"] = {
            "fwd+dw_ms": round(dt_w * 1e3, 3),
            "fwd+dw+dx_ms": round(dt_full * 1e3, 3),
            "gflop_fwd": round(gf, 1),
            "tf_s_full": round(3 * gf / dt_full / 1e3, 1),
        }
        total += dt_full
        print(json.dumps({f"l{li}": results[f"l{li}_{hin}x{cin}->{cout}s{s}"]}),
              flush=True)
    print(json.dumps({"sum_full_ms": round(total * 1e3, 2)}))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
