"""Pallas custom-VJP kernel: the discriminator's fused stem (l0+l1).

The D update dominates the GAN step (~21 of 34.5 ms, BENCH_NOTES.md) and
its two big-spatial entry layers hold ~40% of the ladder at 9-18 TF/s:
the C_in=3 stem conv (reference model_discriminator.py:40-43) and the
first stride-2 block conv. In space-to-depth form (nn/layers.py) the pair
is two STRIDE-1 convs on half-resolution with a LeakyReLU between:

    xs (B, H, W, 4*3)  --3x3 conv, 12->4*nf--  y0s  --lrelu--
                       --2x2 conv, 4*nf->nf, pad (1,0)--  y1 (B, H, W, nf)

XLA runs them as two HBM round trips of the 4*nf-channel intermediate
(~0.8 GB/step at the D update's effective batch 192). This module fuses
the pair into ONE forward and ONE backward pallas kernel with y0s resident
in VMEM; the backward recomputes y0s from xs (11 GF) instead of saving it
(~400 MB), and produces dW/db for both convs plus dxs (needed by the
adversarial-G pass, where gradients flow through D into the fake images).

Semantics (contract tested in tests/test_fused_stem.py):
- dots: operands cast to `compute_dtype`, fp32 MXU accumulation — the
  conv2d_apply contract (nn/layers.py);
- bias + LeakyReLU applied in fp32 between the dots (the unfused bf16 path
  rounds after every op — same deliberate precision improvement as
  ops/pallas/trunk_train.py);
- boundary dtypes: xs/kernels in compute_dtype, biases fp32; cotangents
  match primals (dW in compute_dtype, dbias fp32).

Spectral norm and the s2d kernel packing stay OUTSIDE: callers pass the
outputs of _s2d_kernel_stride1_phases / _s2d_kernel_stride2 and autodiff
pulls the gradients back through packing and normalization (both are
plain differentiable jnp code).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_p(b: int) -> int:
    """Images per grid cell: largest power-of-two divisor of B up to 4
    (P=8 exceeded the 128 MB VMEM budget at the 64x64 D-update shape)."""
    for p in (4, 2, 1):
        if b % p == 0:
            return p
    return 1


# ---------------------------------------------------------------------------
# pure-JAX reference (tests define the contract against this; it is also
# numerically the unfused XLA path modulo the fp32 bias/lrelu staging)
# ---------------------------------------------------------------------------


def fused_stem_ref(xs, wa, ba, wb, bb, *, compute_dtype=jnp.float32,
                   slope=0.01):
    """xs (B,H,W,ci); wa (3,3,ci,cm); ba (cm,); wb (2,2,cm,co); bb (co,)."""
    cd = compute_dtype
    B, H, W, ci = xs.shape
    cm, co = wa.shape[3], wb.shape[3]
    xp = jnp.pad(xs.astype(cd), ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + H, dx:dx + W, :] for dy in range(3)
            for dx in range(3)]
    patch = jnp.concatenate(cols, axis=-1).reshape(B * H * W, 9 * ci)
    y0 = jnp.dot(patch, wa.astype(cd).reshape(9 * ci, cm),
                 preferred_element_type=jnp.float32) + ba.reshape(1, cm)
    y0 = jnp.where(y0 >= 0, y0, slope * y0)
    y0 = y0.reshape(B, H, W, cm).astype(cd)
    # conv B: pad (1,0),(1,0) — output (y,x) reads y0 rows y+a-1, a in {0,1}
    y0p = jnp.pad(y0, ((0, 0), (1, 0), (1, 0), (0, 0)))
    acc = jnp.zeros((B * H * W, co), jnp.float32) + bb.reshape(1, co)
    for t, (a, bcol) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        sl = y0p[:, a:a + H, bcol:bcol + W, :].reshape(B * H * W, cm)
        acc = acc + jnp.dot(sl, wb[a, bcol].astype(cd),
                            preferred_element_type=jnp.float32)
    return acc.reshape(B, H, W, co).astype(cd)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(xs_ref, wa_ref, ba_ref, wb_ref, bb_ref, out_ref,
                xs_pad, y0p, *, P, H, W, ci, cm, co, cd, slope):
    pid = pl.program_id(0)
    M = P * H * W

    @pl.when(pid == 0)
    def _init():
        # zero borders once; interiors are overwritten every cell
        xs_pad[...] = jnp.zeros((P, H + 2, W + 2, ci), xs_pad.dtype)
        y0p[...] = jnp.zeros((P, H + 1, W + 1, cm), y0p.dtype)

    xs_pad[:, 1:H + 1, 1:W + 1, :] = xs_ref[...].astype(xs_pad.dtype)
    patch = jnp.concatenate(
        [xs_pad[:, dy:dy + H, dx:dx + W, :].reshape(M, ci)
         for dy in range(3) for dx in range(3)], axis=1)
    y0 = jnp.dot(patch, wa_ref[...].astype(cd),
                 preferred_element_type=jnp.float32) + ba_ref[...]
    y0 = jnp.where(y0 >= 0, y0, slope * y0)
    y0p[:, 1:H + 1, 1:W + 1, :] = y0.reshape(P, H, W, cm).astype(y0p.dtype)

    acc = jnp.zeros((M, co), jnp.float32) + bb_ref[...]
    for t, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        sl = y0p[:, a:a + H, b:b + W, :].reshape(M, cm)
        acc = acc + jnp.dot(sl, wb_ref[t].astype(cd),
                            preferred_element_type=jnp.float32)
    out_ref[...] = acc.reshape(P, H, W, co).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "cd", "slope"))
def _fwd_pallas(xs, wa_m, ba_row, wb_t, bb_row, *, interpret, cd, slope):
    B, H, W, ci = xs.shape
    cm, co = wa_m.shape[1], wb_t.shape[2]
    P = _pick_p(B)
    kern = functools.partial(_fwd_kernel, P=P, H=H, W=W, ci=ci, cm=cm,
                             co=co, cd=cd, slope=slope)
    out = pl.pallas_call(
        kern,
        grid=(B // P,),
        in_specs=[
            pl.BlockSpec((P, H, W, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wa (9ci, cm)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ba (1, cm) f32
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wb (4, cm, co)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bb (1, co) f32
        ],
        out_specs=pl.BlockSpec((P, H, W, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, co), cd),
        scratch_shapes=[
            pltpu.VMEM((P, H + 2, W + 2, ci), cd),
            pltpu.VMEM((P, H + 1, W + 1, cm), cd),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 2 ** 20,
        ),
        interpret=interpret,
    )(xs, wa_m, ba_row, wb_t, bb_row)
    return out


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(xs_ref, g1_ref, wa_ref, ba_ref, wbt_ref, wat_ref,
                dxs_ref, dwa_ref, dba_ref, dwb_ref, dbb_ref,
                xs_pad, im_a, y0p, g1p, dy0p,
                *, P, H, W, ci, cm, co, cd, slope):
    pid = pl.program_id(0)
    M = P * H * W

    @pl.when(pid == 0)
    def _init():
        xs_pad[...] = jnp.zeros((P, H + 2, W + 2, ci), xs_pad.dtype)
        y0p[...] = jnp.zeros((P, H + 1, W + 1, cm), y0p.dtype)
        g1p[...] = jnp.zeros((P, H + 1, W + 1, co), g1p.dtype)
        dy0p[...] = jnp.zeros((P, H + 2, W + 2, cm), dy0p.dtype)
        dwa_ref[...] = jnp.zeros_like(dwa_ref)
        dba_ref[...] = jnp.zeros_like(dba_ref)
        dwb_ref[...] = jnp.zeros_like(dwb_ref)
        dbb_ref[...] = jnp.zeros_like(dbb_ref)

    # ---- recompute y0s (post-lrelu); stash im2col(xs) for dW_A ----
    xs_pad[:, 1:H + 1, 1:W + 1, :] = xs_ref[...].astype(xs_pad.dtype)
    im_a[...] = jnp.concatenate(
        [xs_pad[:, dy:dy + H, dx:dx + W, :].reshape(M, ci)
         for dy in range(3) for dx in range(3)], axis=1)
    y0 = jnp.dot(im_a[...], wa_ref[...].astype(cd),
                 preferred_element_type=jnp.float32) + ba_ref[...]
    y0 = jnp.where(y0 >= 0, y0, slope * y0)
    y0p[:, 1:H + 1, 1:W + 1, :] = y0.reshape(P, H, W, cm).astype(y0p.dtype)

    # ---- conv-B grads: dW_B[t] += y0s_tap^T @ g1;  db_B += sum(g1) ----
    g1f = g1_ref[...].reshape(M, co).astype(cd)
    g1p[:, 0:H, 0:W, :] = g1_ref[...].astype(g1p.dtype)
    for t, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        sl = y0p[:, a:a + H, b:b + W, :].reshape(M, cm)
        dwb_ref[t] = dwb_ref[t] + jax.lax.dot_general(
            sl, g1f, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dbb_ref[...] = dbb_ref[...] + jnp.sum(
        g1_ref[...].astype(jnp.float32).reshape(M, co), axis=0,
        keepdims=True)

    # ---- data grad through conv B, masked by lrelu'(y0s) ----
    # dy0s[r,c] = sum_t g1p[r+1-a, c+1-b] @ W_B[t]^T  (zero row/col H pad)
    dy0 = jnp.zeros((M, cm), jnp.float32)
    for t, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        sl = g1p[:, 1 - a:1 - a + H, 1 - b:1 - b + W, :].reshape(M, co)
        dy0 = dy0 + jnp.dot(sl, wbt_ref[t].astype(cd),
                            preferred_element_type=jnp.float32)
    # sign(post-lrelu) == sign(pre) since slope > 0: recover mask from y0p
    # (compare in fp32 — Mosaic rejects bf16 cmpf on this target)
    post = y0p[:, 1:H + 1, 1:W + 1, :].reshape(M, cm).astype(jnp.float32)
    dy0 = jnp.where(post >= 0, dy0, slope * dy0)

    # ---- conv-A grads ----
    dba_ref[...] = dba_ref[...] + jnp.sum(dy0, axis=0, keepdims=True)
    dy0c = dy0.astype(cd)
    dwa_ref[...] = dwa_ref[...] + jax.lax.dot_general(
        im_a[...], dy0c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # ---- data grad through conv A (pad both sides by 1) ----
    dy0p[:, 1:H + 1, 1:W + 1, :] = dy0c.reshape(P, H, W, cm)
    dxs = jnp.zeros((M, ci), jnp.float32)
    for sy in range(3):
        for sx in range(3):
            sl = dy0p[:, sy:sy + H, sx:sx + W, :].reshape(M, cm)
            dxs = dxs + jnp.dot(sl, wat_ref[sy * 3 + sx].astype(cd),
                                preferred_element_type=jnp.float32)
    dxs_ref[...] = dxs.reshape(P, H, W, ci).astype(dxs_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "cd", "slope"))
def _bwd_pallas(xs, g1, wa_m, ba_row, wbt, wat, *, interpret, cd, slope):
    B, H, W, ci = xs.shape
    cm, co = wa_m.shape[1], g1.shape[3]
    P = _pick_p(B)
    kern = functools.partial(_bwd_kernel, P=P, H=H, W=W, ci=ci, cm=cm,
                             co=co, cd=cd, slope=slope)
    blk = lambda i: (i, 0, 0, 0)      # noqa: E731
    acc = lambda i: (0, 0)            # noqa: E731 — same block every cell
    acc3 = lambda i: (0, 0, 0)        # noqa: E731
    outs = pl.pallas_call(
        kern,
        grid=(B // P,),
        in_specs=[
            pl.BlockSpec((P, H, W, ci), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((P, H, W, co), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wa (9ci, cm)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ba (1, cm)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wbt (4, co, cm)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wat (9, cm, ci)
        ],
        out_specs=[
            pl.BlockSpec((P, H, W, ci), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * ci, cm), acc, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cm), acc, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, cm, co), acc3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), acc, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, ci), xs.dtype),       # dxs
            jax.ShapeDtypeStruct((9 * ci, cm), jnp.float32),     # dwa
            jax.ShapeDtypeStruct((1, cm), jnp.float32),          # dba
            jax.ShapeDtypeStruct((4, cm, co), jnp.float32),      # dwb
            jax.ShapeDtypeStruct((1, co), jnp.float32),          # dbb
        ],
        scratch_shapes=[
            pltpu.VMEM((P, H + 2, W + 2, ci), cd),   # xs_pad
            pltpu.VMEM((P * H * W, 9 * ci), cd),     # im2col(xs)
            pltpu.VMEM((P, H + 1, W + 1, cm), cd),   # y0s (post-lrelu)
            pltpu.VMEM((P, H + 1, W + 1, co), cd),   # g1 padded
            pltpu.VMEM((P, H + 2, W + 2, cm), cd),   # dy0m padded
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 2 ** 20,
        ),
        interpret=interpret,
    )(xs, g1, wa_m, ba_row, wbt, wat)
    return outs


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def make_fused_stem(interpret: bool = False, compute_dtype=jnp.bfloat16,
                    slope: float = 0.01):
    """Returns f(xs, wa, ba, wb, bb) -> y1 with pallas forward/backward.

    xs (B,H,W,ci) in compute_dtype; wa (3,3,ci,cm) / wb (2,2,cm,co) the
    s2d-packed kernels in compute_dtype; ba (cm,) / bb (co,) fp32.
    Output (B,H,W,co) in compute_dtype (pre-BN, bias included).
    """
    cd = compute_dtype

    def _matforms(wa, wb):
        ci, cm = wa.shape[2], wa.shape[3]
        co = wb.shape[3]
        wa_m = wa.reshape(9 * ci, cm)                     # tap-major rows
        wb_t = wb.reshape(4, cm, co)
        return wa_m, wb_t, ci, cm, co

    @jax.custom_vjp
    def f(xs, wa, ba, wb, bb):
        wa_m, wb_t, ci, cm, co = _matforms(wa, wb)
        return _fwd_pallas(xs, wa_m, ba.reshape(1, cm).astype(jnp.float32),
                           wb_t, bb.reshape(1, co).astype(jnp.float32),
                           interpret=interpret, cd=cd, slope=slope)

    def fwd(xs, wa, ba, wb, bb):
        return f(xs, wa, ba, wb, bb), (xs, wa, ba, wb, bb)

    def bwd(res, g1):
        xs, wa, ba, wb, bb = res
        wa_m, wb_t, ci, cm, co = _matforms(wa, wb)
        # W_B^T per tap: (4, co, cm); W_A^T per dxs-slice: slice start
        # (sy, sx) corresponds to forward tap (2-sy, 2-sx)
        wbt = jnp.swapaxes(wb_t, 1, 2)
        wat = jnp.swapaxes(wa[::-1, ::-1], 2, 3).reshape(9, cm, ci)
        dxs, dwa, dba, dwb, dbb = _bwd_pallas(
            xs, g1.astype(cd), wa_m,
            ba.reshape(1, cm).astype(jnp.float32), wbt, wat,
            interpret=interpret, cd=cd, slope=slope)
        return (dxs.astype(xs.dtype),
                dwa.reshape(3, 3, ci, cm).astype(wa.dtype),
                dba.reshape(cm).astype(ba.dtype),
                dwb.reshape(2, 2, cm, co).astype(wb.dtype),
                dbb.reshape(co).astype(bb.dtype))

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def make_fused_stem_padded(interpret: bool = False,
                           compute_dtype=jnp.bfloat16, slope: float = 0.01,
                           ci_pad: int = 16):
    """fused stem with C_in zero-padded to `ci_pad` lanes (exact math:
    zero input channels multiply zero weight rows).

    Round-3 bounded kernel re-attempt (VERDICT r2 next #3i): the measured
    gap of the P=4 grid-over-batch MXU kernel vs XLA is the *patch
    assembly* — 9 shifted copies concatenated at ci=12-lane offsets into
    the (M, 9*ci) im2col buffer, sub-sublane-aligned VPU relayouts. At
    ci=16 every write lands 16-aligned (and the im2col buffer is 144
    lanes = a clean 128+16 tiling); dot-A pays +33% K FLOPs on zeros
    (~0.15 ms at the D-update shape) against the hoped-for assembly win.
    Padding/slicing live OUTSIDE the custom-VJP (jnp.pad's vjp slices dxs
    back to ci channels automatically), so the kernels are untouched.
    Measured by tools/bench_fused_stem.py --padded.
    """
    base = make_fused_stem(interpret, compute_dtype, slope)

    def f(xs, wa, ba, wb, bb):
        ci = xs.shape[-1]
        if ci >= ci_pad:
            return base(xs, wa, ba, wb, bb)
        xs_p = jnp.pad(xs, ((0, 0), (0, 0), (0, 0), (0, ci_pad - ci)))
        wa_p = jnp.pad(wa, ((0, 0), (0, 0), (0, ci_pad - ci), (0, 0)))
        return base(xs_p, wa_p, ba, wb, bb)

    return f
