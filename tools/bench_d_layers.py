"""Per-layer cost of the discriminator ladder at the D-update's effective
batch (12 slots x batch 16 = 192), fwd+bwd, on the real chip.

Identifies which layers starve the MXU. Uses the chained harness
(tools/_bench_util.py): gradients are part of the returned outputs (no DCE)
and every call depends on the previous one (no relay dedup/pipelining).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from _bench_util import chain_timed


def conv(x, w, stride):
    return lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        window_strides=(stride, stride), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


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

        def loss(w, x):
            y = conv(x, w, s)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        def fwd_dw(w, x):
            return jax.value_and_grad(loss)(w, x)          # (l, gw)

        def fwd_full(w, x):
            return jax.value_and_grad(loss, argnums=(0, 1))(w, x)

        hout = hin // s
        gf = 2 * B * hout * hout * 9 * cin * cout / 1e9
        dt_w = chain_timed(fwd_dw, w, x)                   # chain through w
        dt_full = chain_timed(fwd_full, w, x)
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
