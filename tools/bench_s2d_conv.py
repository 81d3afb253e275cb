"""Direct comparison: stride-2 3x3 conv, native vs space-to-depth lowering,
fwd-only and fwd+grads, per D-ladder shape. Finds which direction the s2d
form helps or hurts."""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from sisr_tpu.nn.layers import _s2d_kernel_stride2, space_to_depth2
from _bench_util import chain_timed


def native(x, w):
    return lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (2, 2),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d(x, w):
    return lax.conv_general_dilated(
        space_to_depth2(x.astype(jnp.bfloat16)),
        _s2d_kernel_stride2(w.astype(jnp.bfloat16)), (1, 1),
        [(1, 0), (1, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"))


def timed(f, *args, iters=30, warm=3):
    # chained harness: no relay dedup/pipelining, no DCE (tools/_bench_util)
    return chain_timed(f, *args, iters=iters, warm=warm) * 1e3


def main():
    rng = np.random.default_rng(0)
    B = 192
    for hin, c in ((128, 64), (64, 128), (32, 256)):
        x = jnp.asarray(rng.normal(0, 1, (B, hin, hin, c)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c)).astype(np.float32))

        # correctness
        yn = np.asarray(native(x, w), np.float32)
        ys = np.asarray(s2d(x, w), np.float32)
        err = float(np.max(np.abs(yn - ys)))

        def g_native(x, w):
            return jax.grad(lambda xx, ww: jnp.sum(
                native(xx, ww).astype(jnp.float32) ** 2),
                argnums=(0, 1))(x, w)

        def g_s2d(x, w):
            return jax.grad(lambda xx, ww: jnp.sum(
                s2d(xx, ww).astype(jnp.float32) ** 2),
                argnums=(0, 1))(x, w)

        res = {
            "fwd_native_ms": round(timed(native, x, w), 3),
            "fwd_s2d_ms": round(timed(s2d, x, w), 3),
            "grad_native_ms": round(timed(g_native, x, w), 3),
            "grad_s2d_ms": round(timed(g_s2d, x, w), 3),
            "max_abs_err": err,
        }
        print(json.dumps({f"{hin}x{c}": res}), flush=True)


if __name__ == "__main__":
    main()
