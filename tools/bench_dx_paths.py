"""Isolate stride-2 conv gradient costs: native input-dilated dx vs the
phase-packed dx, and the dW correlation, per D-ladder strided shape."""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from sisr_tpu.nn.layers import depth_to_space2_phases
from _bench_util import chain_timed


def timed(f, *args, iters=30, warm=3):
    # chained harness: no relay dedup/pipelining, no DCE (tools/_bench_util)
    return round(chain_timed(f, *args, iters=iters, warm=warm) * 1e3, 3)


def main():
    rng = np.random.default_rng(0)
    B = 192
    for hin, c in ((128, 64), (64, 128), (32, 256)):
        hy = hin // 2
        x = jnp.asarray(rng.normal(0, 1, (B, hin, hin, c))
                        .astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c)).astype(np.float32)).astype(jnp.bfloat16)
        g = jnp.asarray(rng.normal(0, 1, (B, hy, hy, c)).astype(np.float32)).astype(jnp.bfloat16)

        def dx_native(g, w):
            # what XLA autodiff emits: input-dilated transposed conv
            return lax.conv_general_dilated(
                g, jnp.rot90(w, 2, (0, 1)).swapaxes(2, 3),
                window_strides=(1, 1), padding=[(1, 1), (1, 1)],
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def dx_phase(g, w):
            cin, cout = w.shape[2], w.shape[3]
            wb = jnp.zeros((2, 2, cout, 2, 2, cin), w.dtype)
            for dy in range(3):
                a, p = (dy + 1) // 2, (dy + 1) % 2
                for dx_ in range(3):
                    bb, q = (dx_ + 1) // 2, (dx_ + 1) % 2
                    wb = wb.at[1 - a, 1 - bb, :, p, q, :].set(
                        jnp.transpose(w[dy, dx_], (1, 0)))
            wb = wb.reshape(2, 2, cout, 4 * cin)
            y = lax.conv_general_dilated(
                g, wb, (1, 1), [(0, 1), (0, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return depth_to_space2_phases(y)

        def dx_phase_nod2s(g, w):
            cin, cout = w.shape[2], w.shape[3]
            wb = jnp.zeros((2, 2, cout, 4 * cin), w.dtype)
            y = lax.conv_general_dilated(
                g, wb, (1, 1), [(0, 1), (0, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y

        def dw(x, g):
            return lax.conv_general_dilated(
                x, g, (1, 1), [(1, 0), (1, 0)], rhs_dilation=(2, 2),
                dimension_numbers=("CHWN", "IHWO", "HWNC"))

        res = {
            "dx_native_ms": timed(dx_native, g, w),
            "dx_phase_ms": timed(dx_phase, g, w),
            "dx_phase_conv_only_ms": timed(dx_phase_nod2s, g, w),
            "dw_ms": timed(dw, x, g),
        }
        print(json.dumps({f"{hin}x{c}": res}), flush=True)


if __name__ == "__main__":
    main()
