"""Layout / formulation sweep for the two starved D-ladder layers.

VERDICT r2 weak #1 / next-round #3(ii): l0 (3->64 @128^2 s1, 9.1 TF/s) and
l1 (64->64 @128^2 s2, 17.5 TF/s) hold 40% of the D-ladder's time at the
D-update batch (12 slots x 16 = 192). This sweeps exact-math alternatives
per layer, fwd+dw+dx with the chained no-DCE harness (tools/_bench_util):

  l0: NHWC bf16 (baseline) | NCHW | fp32 | C_in zero-padded to 4 / 8 |
      explicit patches+dot_general (matmul formulation) | fwd+dw only
  l1: NHWC bf16 (baseline) | NCHW | fp32

All variants compute the same dot products (zero-padded input channels
multiply zero weights; patches+dot is im2col by construction), so any win
is free. Run on the real chip; results belong in BENCH_NOTES.
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

B = int(os.environ.get("SISR_L01_B", "192"))


def timed_grad(conv_fn, w, x, *, argnums=(0, 1), iters=30):
    def loss(w, x):
        y = conv_fn(x, w)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def fwd_full(w, x):
        return jax.value_and_grad(loss, argnums=argnums)(w, x)

    return chain_timed(fwd_full, w, x, iters=iters)


def report(name, dt, gf):
    row = {"variant": name, "ms": round(dt * 1e3, 3),
           "tf_s": round(3 * gf / dt / 1e3, 1)}
    print(json.dumps(row), flush=True)
    return row


def main():
    rng = np.random.default_rng(0)
    results = []

    # ------------------------------------------------------------- l0
    H, CIN, COUT = 128, 3, 64
    gf0 = 2 * B * H * H * 9 * CIN * COUT / 1e9
    x_nhwc = jnp.asarray(rng.normal(0, 1, (B, H, H, CIN)).astype(np.float32))
    w_hwio = jnp.asarray(rng.normal(0, 0.05, (3, 3, CIN, COUT)).astype(np.float32))

    def conv_nhwc(x, w, dt=jnp.bfloat16, stride=1, **kw):
        return lax.conv_general_dilated(
            x.astype(dt), w.astype(dt), (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw)

    results.append(report("l0/nhwc_bf16",
                          timed_grad(conv_nhwc, w_hwio, x_nhwc), gf0))
    results.append(report("l0/nhwc_f32",
                          timed_grad(lambda x, w: conv_nhwc(x, w, jnp.float32),
                                     w_hwio, x_nhwc), gf0))
    # NCHW / OIHW, tensors pre-transposed (layout lives outside the timing)
    x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    w_oihw = jnp.transpose(w_hwio, (3, 2, 0, 1))

    def conv_nchw(x, w, stride=1):
        return lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    results.append(report("l0/nchw_bf16",
                          timed_grad(conv_nchw, w_oihw, x_nchw), gf0))

    # zero-padded input channels (pad once, outside the chain)
    for cpad in (4, 8):
        xp = jnp.pad(x_nhwc, ((0, 0), (0, 0), (0, 0), (0, cpad - CIN)))
        wp = jnp.pad(w_hwio, ((0, 0), (0, 0), (0, cpad - CIN), (0, 0)))
        results.append(report(f"l0/nhwc_bf16_cinpad{cpad}",
                              timed_grad(conv_nhwc, wp, xp), gf0))

    # explicit matmul formulation: patches (B,H,W,27) . (27,64)
    def conv_patches(x, w):
        p = lax.conv_general_dilated_patches(
            x.astype(jnp.bfloat16), (3, 3), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # patches' feature dim is channel-major (C, kh, kw) — verified exact
        wf = jnp.transpose(w.astype(jnp.bfloat16), (2, 0, 1, 3)) \
            .reshape(CIN * 9, COUT)
        return jax.lax.dot_general(p, wf, (((3,), (0,)), ((), ())))

    results.append(report("l0/patches_dot",
                          timed_grad(conv_patches, w_hwio, x_nhwc), gf0))

    # without dx (the D update's real/replay slots never need input grads)
    results.append(report("l0/nhwc_bf16_fwd_dw_only",
                          timed_grad(conv_nhwc, w_hwio, x_nhwc,
                                     argnums=(0,)), gf0))

    # ------------------------------------------------------------- l1
    C1 = 64
    gf1 = 2 * B * 64 * 64 * 9 * C1 * C1 / 1e9
    x1 = jnp.asarray(rng.normal(0, 1, (B, H, H, C1)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.05, (3, 3, C1, C1)).astype(np.float32))

    results.append(report(
        "l1/nhwc_bf16",
        timed_grad(lambda x, w: conv_nhwc(x, w, stride=2), w1, x1), gf1))
    results.append(report(
        "l1/nhwc_f32",
        timed_grad(lambda x, w: conv_nhwc(x, w, jnp.float32, stride=2),
                   w1, x1), gf1))
    x1c = jnp.transpose(x1, (0, 3, 1, 2))
    w1c = jnp.transpose(w1, (3, 2, 0, 1))
    results.append(report(
        "l1/nchw_bf16",
        timed_grad(lambda x, w: conv_nchw(x, w, stride=2), w1c, x1c), gf1))

    # stride-2 as explicit patches+dot (XLA materializes the im2col and
    # runs a dense GEMM — different lowering than the strided conv; the
    # wgrad in particular becomes a plain dot_general transpose)
    def conv_patches_s2(x, w, cin):
        p = lax.conv_general_dilated_patches(
            x.astype(jnp.bfloat16), (3, 3), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        wf = jnp.transpose(w.astype(jnp.bfloat16), (2, 0, 1, 3)) \
            .reshape(cin * 9, w.shape[3])
        return jax.lax.dot_general(p, wf, (((3,), (0,)), ((), ())))

    results.append(report(
        "l1/patches_dot",
        timed_grad(lambda x, w: conv_patches_s2(x, w, C1), w1, x1), gf1))
    # without dx (real/replay D-update slots never need input grads)
    results.append(report(
        "l1/nhwc_bf16_fwd_dw_only",
        timed_grad(lambda x, w: conv_nhwc(x, w, stride=2), w1, x1,
                   argnums=(0,)), gf1))

    # --------------------------------------------- l3 (128->128 @64² s2)
    # the next starved stride-2 layer (43 TF/s, ~2.3 ms headroom at b192)
    C3, H3 = 128, 64
    gf3 = 2 * B * 32 * 32 * 9 * C3 * C3 / 1e9
    x3 = jnp.asarray(rng.normal(0, 1, (B, H3, H3, C3)).astype(np.float32))
    w3 = jnp.asarray(rng.normal(0, 0.05, (3, 3, C3, C3)).astype(np.float32))
    results.append(report(
        "l3/nhwc_bf16",
        timed_grad(lambda x, w: conv_nhwc(x, w, stride=2), w3, x3), gf3))
    x3c = jnp.transpose(x3, (0, 3, 1, 2))
    w3c = jnp.transpose(w3, (3, 2, 0, 1))
    results.append(report(
        "l3/nchw_bf16",
        timed_grad(lambda x, w: conv_nchw(x, w, stride=2), w3c, x3c), gf3))
    results.append(report(
        "l3/patches_dot",
        timed_grad(lambda x, w: conv_patches_s2(x, w, C3), w3, x3), gf3))
    results.append(report(
        "l3/nhwc_bf16_fwd_dw_only",
        timed_grad(lambda x, w: conv_nhwc(x, w, stride=2), w3, x3,
                   argnums=(0,)), gf3))

    print(json.dumps({"batch": B, "rows": results}))


if __name__ == "__main__":
    main()
