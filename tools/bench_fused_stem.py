"""Fused D-stem kernel (l0+l1) vs the XLA s2d region at the D update's
effective batch (12 slots x 16 = 192), fwd and fwd+grads, chained timing.

The XLA side is discriminator.py's FUSE_STEM region verbatim; grads are
taken w.r.t. the two kernels + biases (what the D update needs — the
pallas bwd additionally computes dxs, which is included in its cost)."""
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
from sisr_tpu.nn.layers import (
    _s2d_kernel_stride1_phases,
    _s2d_kernel_stride2,
    space_to_depth2,
)
from sisr_tpu.ops.pallas.fused_stem import (
    make_fused_stem,
    make_fused_stem_padded,
)

B, HW, NF = 192, 128, 64
CD = jnp.bfloat16
SLOPE = 0.01


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, HW, HW, 3)).astype(np.float32))
    k_stem = jnp.asarray(rng.normal(0, 0.05, (3, 3, 3, NF))
                         .astype(np.float32))
    b_stem = jnp.asarray(rng.normal(0, 0.01, (NF,)).astype(np.float32))
    k0 = jnp.asarray(rng.normal(0, 0.05, (3, 3, NF, NF)).astype(np.float32))
    b0 = jnp.asarray(rng.normal(0, 0.01, (NF,)).astype(np.float32))
    xs = space_to_depth2(x).astype(CD)

    def region_xla(xs_in, k_stem, b_stem, k0, b0):
        y = lax.conv_general_dilated(
            xs_in, _s2d_kernel_stride1_phases(k_stem).astype(CD), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + jnp.tile(b_stem, 4).astype(y.dtype)
        y = jnp.where(y >= 0, y, SLOPE * y)
        y = lax.conv_general_dilated(
            y, _s2d_kernel_stride2(k0).astype(CD), (1, 1),
            [(1, 0), (1, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b0.astype(y.dtype)

    f = make_fused_stem(interpret=False, compute_dtype=CD, slope=SLOPE)
    fp = make_fused_stem_padded(interpret=False, compute_dtype=CD,
                                slope=SLOPE)

    def region_pallas(xs_in, k_stem, b_stem, k0, b0):
        return f(xs_in, _s2d_kernel_stride1_phases(k_stem).astype(CD),
                 jnp.tile(b_stem, 4), _s2d_kernel_stride2(k0).astype(CD),
                 b0)

    def region_pallas_pad16(xs_in, k_stem, b_stem, k0, b0):
        # lane-aligned patch assembly: C_in zero-padded 12 -> 16
        return fp(xs_in, _s2d_kernel_stride1_phases(k_stem).astype(CD),
                  jnp.tile(b_stem, 4), _s2d_kernel_stride2(k0).astype(CD),
                  b0)

    def wgrad(region):
        def loss(xs_in, k_stem, b_stem, k0, b0):
            out = region(xs_in, k_stem, b_stem, k0, b0)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jax.value_and_grad(loss, argnums=(1, 2, 3, 4))

    res = {}
    for name, region in (("xla", region_xla), ("pallas", region_pallas),
                         ("pallas_pad16", region_pallas_pad16)):
        dt = chain_timed(region, xs, k_stem, b_stem, k0, b0, iters=30)
        res[f"{name}_fwd_ms"] = round(dt * 1e3, 3)
        dt = chain_timed(wgrad(region), xs, k_stem, b_stem, k0, b0,
                         iters=30)
        res[f"{name}_fwdbwd_ms"] = round(dt * 1e3, 3)
        print(json.dumps(res), flush=True)

    # numerical sanity on-device (bf16 tolerance)
    o_x = region_xla(xs, k_stem, b_stem, k0, b0)
    o_p = region_pallas(xs, k_stem, b_stem, k0, b0)
    err = float(jnp.max(jnp.abs(o_x.astype(jnp.float32)
                                - o_p.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(o_x.astype(jnp.float32))))
    res["max_abs_err"] = err
    res["out_scale"] = scale
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
