"""Pallas custom-VJP kernel: the generator's residual trunk in TRAIN mode.

Round-1 profiling showed the GAN step is kernel-bound with the 64-channel
32x32 trunk convs running at 3-8 TF/s through XLA (BENCH_NOTES.md): each of
the 33 convs is an HBM round trip on a starved shape. This module runs the
whole trunk — 16 x [conv-BN-PReLU-conv-BN-residual] + trunk-end conv-BN +
global skip (reference model_generator.py:86-96 forward semantics, train
mode) — as TWO pallas kernels (forward / backward) with the activation
chain resident in VMEM (~128 MB on v5e, unlocked via vmem_limit_bytes).

Semantics (contracts tested in tests/test_trunk_train.py):
- convs: 3x3 SAME, bias, operands cast to `compute_dtype` for the MXU dot
  with fp32 accumulation — same contract as nn/layers.conv2d_apply;
- BatchNorm train mode: normalize by biased batch stats over (B, H, W)
  (nn/layers.batchnorm_apply); the kernel RETURNS (mu, var) so the caller
  applies the running-stat momentum update in closed form;
- PReLU with per-block scalar alpha;
- deliberate precision improvement over the unfused path: intermediate
  activations stay fp32 in VMEM between ops (the XLA bf16 path rounds to
  bfloat16 after every op); only MXU operands are cast down.

The backward kernel reconstructs the x-chain in reverse (x_b = x_{b+1} -
bn2out, recomputed from the saved raw conv outputs y1/y2 and batch stats),
so only y1, y2 per block (+ y_end, x_last) are saved. Data gradients reuse
the same 9-tap im2col dot with tap-rotated / io-transposed weights; weight
gradients are im2col(x)^T @ dy dots accumulated in a VMEM scratch across
the whole reverse sweep.

Spectral norm stays OUTSIDE: callers pass SN-normalized kernels and jax
autodiff pulls dW_bar back through the normalization (generator.py).
Batch-stat outputs are non-differentiable (their cotangents are ignored) —
they only feed the running-stat update, which the train step stop-gradients
exactly like torch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5


# ---------------------------------------------------------------------------
# weight packing
# ---------------------------------------------------------------------------


def pack_trunk_weights(block_params, block_end_params):
    """(w, b, gamma, beta, alpha) arrays from the generator's block params.

    Kernels must already be SN-normalized (pass the outputs of sn_normalize,
    NOT the raw params). Layout: w (L, 9*nf, nf) with rows grouped by tap
    (dy*3+dx) then input channel — the im2col layout of ops/pallas/trunk.py.
    L = 2*n_blocks + 1; layer 2k = conv1 of block k, 2k+1 = conv2,
    2*n_blocks = trunk-end conv.
    """
    ws, bs, gs, bts, alphas = [], [], [], [], []
    for bp in block_params:
        for conv, bn in (("conv1", "bn1"), ("conv2", "bn2")):
            k = bp[conv]["kernel"]
            nf = k.shape[-1]
            ws.append(k.reshape(9 * nf, nf))
            bs.append(bp[conv]["bias"])
            gs.append(bp[bn]["scale"])
            bts.append(bp[bn]["bias"])
        alphas.append(bp["prelu"]["alpha"].reshape(()))
    k = block_end_params["conv"]["kernel"]
    nf = k.shape[-1]
    ws.append(k.reshape(9 * nf, nf))
    bs.append(block_end_params["conv"]["bias"])
    gs.append(block_end_params["bn"]["scale"])
    bts.append(block_end_params["bn"]["bias"])
    return (jnp.stack(ws), jnp.stack(bs), jnp.stack(gs), jnp.stack(bts),
            jnp.stack(alphas))


def unpack_trunk_grads(dw, db, dgamma, dbeta, dalpha, n_blocks: int, nf: int):
    """Inverse of pack_trunk_weights for the gradient pytrees."""
    blocks = []
    for k in range(n_blocks):
        blocks.append({
            "conv1": {"kernel": dw[2 * k].reshape(3, 3, nf, nf),
                      "bias": db[2 * k]},
            "bn1": {"scale": dgamma[2 * k], "bias": dbeta[2 * k]},
            "prelu": {"alpha": dalpha[k].reshape(())},
            "conv2": {"kernel": dw[2 * k + 1].reshape(3, 3, nf, nf),
                      "bias": db[2 * k + 1]},
            "bn2": {"scale": dgamma[2 * k + 1], "bias": dbeta[2 * k + 1]},
        })
    end = {"conv": {"kernel": dw[2 * n_blocks].reshape(3, 3, nf, nf),
                    "bias": db[2 * n_blocks]},
           "bn": {"scale": dgamma[2 * n_blocks], "bias": dbeta[2 * n_blocks]}}
    return blocks, end


def rotate_io(w):
    """(L, 9*nf, nf) forward weights -> backward-data weights: tap (dy, dx)
    -> (2-dy, 2-dx) and in/out channels transposed, same packed layout."""
    L, K9, nf = w.shape
    wt = w.reshape(L, 9, nf, nf)
    wt = wt[:, ::-1]                       # tap rotation (reverses dy*3+dx)
    wt = jnp.swapaxes(wt, 2, 3)            # io transpose
    return wt.reshape(L, K9, nf)


# ---------------------------------------------------------------------------
# pure-JAX reference (tests define the contract against this)
# ---------------------------------------------------------------------------


def _conv9_ref(x, w, compute_dtype):
    """3x3 SAME conv of (B,H,W,nf) against packed (9*nf, nf) weights."""
    B, H, W, nf = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + H, dx:dx + W, :] for dy in range(3)
            for dx in range(3)]
    patch = jnp.concatenate(cols, axis=-1).reshape(B * H * W, 9 * nf)
    y = jnp.dot(patch.astype(compute_dtype), w.astype(compute_dtype),
                preferred_element_type=jnp.float32)
    return y.reshape(B, H, W, nf)


def _bn_train_ref(y, gamma, beta):
    mu = jnp.mean(y, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(y), axis=(0, 1, 2)) - jnp.square(mu)
    inv = jax.lax.rsqrt(var + EPS)
    return (y - mu) * inv * gamma + beta, mu, var


def trunk_train_ref(x0, w, b, gamma, beta, alpha,
                    compute_dtype=jnp.float32):
    """Reference implementation. Returns (out, mu (L,nf), var (L,nf))."""
    L = w.shape[0]
    n_blocks = (L - 1) // 2
    mus, vars_ = [], []
    x = x0
    for k in range(n_blocks):
        y1 = _conv9_ref(x, w[2 * k], compute_dtype) + b[2 * k]
        h, mu1, v1 = _bn_train_ref(y1, gamma[2 * k], beta[2 * k])
        h = jnp.where(h >= 0, h, alpha[k] * h)
        y2 = _conv9_ref(h, w[2 * k + 1], compute_dtype) + b[2 * k + 1]
        h2, mu2, v2 = _bn_train_ref(y2, gamma[2 * k + 1], beta[2 * k + 1])
        x = x + h2
        mus += [mu1, mu2]
        vars_ += [v1, v2]
    ye = _conv9_ref(x, w[L - 1], compute_dtype) + b[L - 1]
    he, mue, ve = _bn_train_ref(ye, gamma[L - 1], beta[L - 1])
    mus.append(mue)
    vars_.append(ve)
    return he + x0, jnp.stack(mus), jnp.stack(vars_)


# ---------------------------------------------------------------------------
# forward pallas kernel
# ---------------------------------------------------------------------------


def _chunks(B: int):
    """Split the batch into two im2col chunks: M = B*H*W/2 dots keep the
    MXU fed (per-image M=H*W ran ~2x slower) while halving the ~19 MB
    whole-batch patch that pushed the backward past the 128 MB VMEM."""
    half = max(1, B // 2)
    return [(0, half)] + ([(half, B)] if half < B else [])


def _im2col_rows(src_ref, b0: int, b1: int, H: int, W: int, nf: int, cd):
    """im2col of images [b0, b1) from a zero-bordered (B, H+2, W+2, nf)
    ref: ((b1-b0)*H*W, 9*nf), tap-major columns."""
    cols = [src_ref[b0:b1, dy:dy + H, dx:dx + W, :]
            .reshape((b1 - b0) * H * W, nf)
            for dy in range(3) for dx in range(3)]
    return jnp.concatenate(cols, axis=1).astype(cd)


def _fwd_kernel(x0_ref, w_ref, b_ref, g_ref, bt_ref, a_ref,
                out_ref, y1_ref, y2_ref, ye_ref, xl_ref, mu_ref, var_ref,
                x_halo, h_halo, *, B, H, W, nf, n_blocks, cd):
    k = pl.program_id(0)
    N = B * H * W

    @pl.when(k == 0)
    def _init():
        x_halo[...] = jnp.zeros((B, H + 2, W + 2, nf), jnp.float32)
        h_halo[...] = jnp.zeros((B, H + 2, W + 2, nf), jnp.float32)
        x_halo[:, 1:H + 1, 1:W + 1, :] = x0_ref[...].astype(jnp.float32)

    def conv_layer(src, dst_ref, li):
        """conv layer li over all images; writes raw y into dst_ref and
        returns (mu, var) each (1, nf)."""
        w = w_ref[li].astype(cd)
        brow = b_ref[li].reshape(1, nf)
        for b0, b1 in _chunks(B):
            patch = _im2col_rows(src, b0, b1, H, W, nf, cd)
            y = jnp.dot(patch, w, preferred_element_type=jnp.float32) + brow
            dst_ref[b0:b1] = y.reshape(b1 - b0, H, W, nf) \
                .astype(dst_ref.dtype)
        yf = dst_ref[...].astype(jnp.float32).reshape(N, nf)
        mu = jnp.sum(yf, axis=0, keepdims=True) / N
        var = jnp.sum(jnp.square(yf), axis=0, keepdims=True) / N \
            - jnp.square(mu)
        return mu, var

    def bn(dst_ref, mu, var, li):
        inv = jax.lax.rsqrt(var + EPS)
        scale = (g_ref[li].reshape(1, nf) * inv).reshape(1, 1, 1, nf)
        shift = (bt_ref[li].reshape(1, nf)
                 - mu * g_ref[li].reshape(1, nf) * inv).reshape(1, 1, 1, nf)
        return dst_ref[...].astype(jnp.float32) * scale + shift

    @pl.when(k < n_blocks)
    def _block():
        li1 = 2 * k
        li2 = 2 * k + 1
        mu1, var1 = conv_layer(x_halo, y1_ref, li1)
        h = bn(y1_ref, mu1, var1, li1)
        alpha = a_ref[k, 0]
        h = jnp.where(h >= 0, h, alpha * h)
        h_halo[:, 1:H + 1, 1:W + 1, :] = h

        mu2, var2 = conv_layer(h_halo, y2_ref, li2)
        h2 = bn(y2_ref, mu2, var2, li2)
        x_halo[:, 1:H + 1, 1:W + 1, :] = (
            x_halo[:, 1:H + 1, 1:W + 1, :] + h2)

        mu_ref[pl.ds(2 * k, 2)] = jnp.concatenate([mu1, mu2], axis=0)
        var_ref[pl.ds(2 * k, 2)] = jnp.concatenate([var1, var2], axis=0)

    @pl.when(k == n_blocks)
    def _end():
        li = 2 * n_blocks
        xl_ref[...] = x_halo[:, 1:H + 1, 1:W + 1, :]
        mue, vare = conv_layer(x_halo, ye_ref, li)
        he = bn(ye_ref, mue, vare, li)
        out_ref[...] = he + x0_ref[...].astype(jnp.float32)
        mu_ref[pl.ds(2 * n_blocks, 2)] = jnp.concatenate(
            [mue, mue * 0.0], axis=0)
        var_ref[pl.ds(2 * n_blocks, 2)] = jnp.concatenate(
            [vare, vare * 0.0], axis=0)


@functools.partial(jax.jit, static_argnames=("n_blocks", "interpret", "cd"))
def _fwd_pallas(x0, w, b, gamma, beta, alpha2d, *, n_blocks, interpret, cd):
    B, H, W, nf = x0.shape
    kern = functools.partial(_fwd_kernel, B=B, H=H, W=W, nf=nf,
                             n_blocks=n_blocks, cd=cd)
    full4 = lambda k: (0, 0, 0, 0)                 # noqa: E731
    blk = lambda k: (jnp.minimum(k, n_blocks - 1), 0, 0, 0)  # noqa: E731
    outs = pl.pallas_call(
        kern,
        grid=(n_blocks + 1,),
        in_specs=[
            pl.BlockSpec((B, H, W, nf), full4, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w (L, 9nf, nf)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b (L, nf)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gamma
            pl.BlockSpec(memory_space=pltpu.VMEM),   # beta
            pl.BlockSpec((n_blocks, 1), memory_space=pltpu.SMEM),  # alpha
        ],
        out_specs=[
            pl.BlockSpec((B, H, W, nf), full4, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H, W, nf), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H, W, nf), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H, W, nf), full4, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H, W, nf), full4, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mu, whole array
            pl.BlockSpec(memory_space=pltpu.VMEM),   # var, whole array
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, nf), jnp.float32),              # out
            jax.ShapeDtypeStruct((n_blocks * B, H, W, nf), cd),            # y1s
            jax.ShapeDtypeStruct((n_blocks * B, H, W, nf), cd),            # y2s
            jax.ShapeDtypeStruct((B, H, W, nf), cd),                       # y_end
            jax.ShapeDtypeStruct((B, H, W, nf), jnp.float32),              # x_last
            jax.ShapeDtypeStruct((2 * (n_blocks + 1), nf), jnp.float32),   # mu
            jax.ShapeDtypeStruct((2 * (n_blocks + 1), nf), jnp.float32),   # var
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H + 2, W + 2, nf), jnp.float32),
            pltpu.VMEM((B, H + 2, W + 2, nf), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 2 ** 20,
        ),
        interpret=interpret,
    )(x0, w, b, gamma, beta, alpha2d)
    return outs


# ---------------------------------------------------------------------------
# backward pallas kernel
# ---------------------------------------------------------------------------
#
# Grid step i:
#   i == 0             -> trunk-end layer (uses x_last, y_end)
#   i in [1, n_blocks] -> block (n_blocks - i), reverse order
#
# Scratch carries between steps:
#   x_halo : x_{b+1} interior at step start; overwritten in place with x_b
#   dx_buf : dL/dx_{b+1} at step start -> dL/dx_b at step end
#   dy_halo: zero-bordered buffer for the transposed-conv data gradients
#   h_halo : recomputed post-PReLU activation (for dW2 im2col)
#   da_buf : data gradient flowing into the PReLU
#   dwacc / small accumulators: parameter gradients, written out at the end.


def _bn_bwd(dout, yf, mu, var, gamma, N, nf):
    """Train-mode BN backward. All (N, nf) flat; mu/var/gamma (1, nf).
    Returns (dy, dgamma (1,nf), dbeta (1,nf), xhat)."""
    inv = jax.lax.rsqrt(var + EPS)
    xhat = (yf - mu) * inv
    s_db = jnp.sum(dout, axis=0, keepdims=True)
    s_dg = jnp.sum(dout * xhat, axis=0, keepdims=True)
    dy = (gamma * inv) * (dout - s_db / N - xhat * (s_dg / N))
    return dy, s_dg, s_db, xhat


def _bwd_kernel(g_ref, xl_ref, ye_ref, y1_ref, y2_ref,
                wb_ref, gb_ref, a_ref, mu_ref, var_ref,
                dx0_ref, dw_ref, db_ref, dg_ref, dbt_ref, dal_ref,
                x_halo, dx_buf, dy_halo, h_halo, xh_buf,
                *, B, H, W, nf, n_blocks, cd):
    """gb_ref: (2L, nf) = concat([gamma, beta]). Every whole-batch
    intermediate is staged through a scratch ref immediately so the Mosaic
    register allocator can retire it before the unrolled conv loops — the
    naive value-carrying formulation exceeded the ~128 MB VMEM budget."""
    i = pl.program_id(0)
    N = B * H * W
    L = 2 * n_blocks + 1

    def gamma_row(li):
        return gb_ref[pl.ds(li, 1)]

    def beta_row(li):
        return gb_ref[pl.ds(L + li, 1)]

    def conv_wgrad(src_halo, li):
        """dW[li] += sum_b im2col(src_b)^T @ dy_b, dy read from dy_halo."""
        acc = jnp.zeros((9 * nf, nf), jnp.float32)
        for b0, b1 in _chunks(B):
            patch = _im2col_rows(src_halo, b0, b1, H, W, nf, cd)
            dyf = dy_halo[b0:b1, 1:H + 1, 1:W + 1, :] \
                .reshape((b1 - b0) * H * W, nf).astype(cd)
            acc = acc + jax.lax.dot_general(
                patch, dyf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dw_ref[pl.ds(li, 1)] = dw_ref[pl.ds(li, 1)] + acc[None]

    def conv_data_into(dst_ref, li, accumulate, interior=False):
        w = wb_ref[li].astype(cd)
        for b0, b1 in _chunks(B):
            patch = _im2col_rows(dy_halo, b0, b1, H, W, nf, cd)
            d = jnp.dot(patch, w, preferred_element_type=jnp.float32) \
                .reshape(b1 - b0, H, W, nf)
            if interior:
                # in-place into dy_halo's interior: the patch for this
                # chunk is materialized before the store, and each image's
                # conv reads only its own rows, so there is no hazard
                dst_ref[b0:b1, 1:H + 1, 1:W + 1, :] = d.astype(dst_ref.dtype)
            else:
                if accumulate:
                    d = dst_ref[b0:b1].astype(jnp.float32) + d
                dst_ref[b0:b1] = d.astype(dst_ref.dtype)

    @pl.when(i == 0)
    def _end_layer():
        dw_ref[...] = jnp.zeros((L, 9 * nf, nf), jnp.float32)
        db_ref[...] = jnp.zeros((L, nf), jnp.float32)
        dg_ref[...] = jnp.zeros((L, nf), jnp.float32)
        dbt_ref[...] = jnp.zeros((L, nf), jnp.float32)
        dal_ref[...] = jnp.zeros((max(n_blocks, 1), nf), jnp.float32)
        x_halo[...] = jnp.zeros((B, H + 2, W + 2, nf), jnp.float32)
        dy_halo[...] = jnp.zeros((B, H + 2, W + 2, nf), dy_halo.dtype)
        h_halo[...] = jnp.zeros((B, H + 2, W + 2, nf), h_halo.dtype)

        li = 2 * n_blocks
        x_halo[:, 1:H + 1, 1:W + 1, :] = xl_ref[...]
        gmat = g_ref[...].reshape(N, nf)
        yef = ye_ref[...].astype(jnp.float32).reshape(N, nf)
        dy, s_dg, s_db, _ = _bn_bwd(gmat, yef, mu_ref[pl.ds(li, 1)],
                                    var_ref[pl.ds(li, 1)],
                                    gamma_row(li), N, nf)
        dg_ref[pl.ds(li, 1)] = s_dg
        dbt_ref[pl.ds(li, 1)] = s_db
        db_ref[pl.ds(li, 1)] = jnp.sum(dy, axis=0, keepdims=True)
        dy_halo[:, 1:H + 1, 1:W + 1, :] = \
            dy.reshape(B, H, W, nf).astype(dy_halo.dtype)
        conv_wgrad(x_halo, li)
        conv_data_into(dx_buf, li, accumulate=False)

    @pl.when(i > 0)
    def _block():
        k = n_blocks - i
        li1 = 2 * k
        li2 = 2 * k + 1

        # ---- stage 1: reconstruct x_b in place + BN2 backward ----
        y2f = y2_ref[...].astype(jnp.float32).reshape(N, nf)
        inv2 = jax.lax.rsqrt(var_ref[pl.ds(li2, 1)] + EPS)
        xhat2 = (y2f - mu_ref[pl.ds(li2, 1)]) * inv2
        bn2out = gamma_row(li2) * xhat2 + beta_row(li2)
        x_halo[:, 1:H + 1, 1:W + 1, :] = (
            x_halo[:, 1:H + 1, 1:W + 1, :] - bn2out.reshape(B, H, W, nf))
        dxf = dx_buf[...].reshape(N, nf)
        s_db2 = jnp.sum(dxf, axis=0, keepdims=True)
        s_dg2 = jnp.sum(dxf * xhat2, axis=0, keepdims=True)
        dy2 = (gamma_row(li2) * inv2) * (dxf - s_db2 / N
                                         - xhat2 * (s_dg2 / N))
        dg_ref[pl.ds(li2, 1)] = dg_ref[pl.ds(li2, 1)] + s_dg2
        dbt_ref[pl.ds(li2, 1)] = dbt_ref[pl.ds(li2, 1)] + s_db2
        db_ref[pl.ds(li2, 1)] = db_ref[pl.ds(li2, 1)] \
            + jnp.sum(dy2, axis=0, keepdims=True)
        dy_halo[:, 1:H + 1, 1:W + 1, :] = \
            dy2.reshape(B, H, W, nf).astype(dy_halo.dtype)

        # ---- stage 2: recompute h = prelu(bn1(y1)); stash xhat1 ----
        y1f = y1_ref[...].astype(jnp.float32).reshape(N, nf)
        inv1 = jax.lax.rsqrt(var_ref[pl.ds(li1, 1)] + EPS)
        xhat1 = (y1f - mu_ref[pl.ds(li1, 1)]) * inv1
        xh_buf[...] = xhat1.reshape(B, H, W, nf).astype(xh_buf.dtype)
        bn1out = gamma_row(li1) * xhat1 + beta_row(li1)
        alpha = a_ref[k, 0]
        h_halo[:, 1:H + 1, 1:W + 1, :] = jnp.where(
            bn1out >= 0, bn1out, alpha * bn1out
        ).reshape(B, H, W, nf).astype(h_halo.dtype)

        # ---- stage 3/4: dW2, then the data grad into the PReLU written
        # over dy_halo's interior (dy2 is dead once both convs consumed it,
        # and a separate da buffer pushed the kernel past the VMEM budget)
        conv_wgrad(h_halo, li2)
        conv_data_into(dy_halo, li2, accumulate=False, interior=True)

        # ---- stage 5: PReLU + BN1 backward (re-read stashed xhat1) ----
        xhat1 = xh_buf[...].astype(jnp.float32).reshape(N, nf)
        bn1out = gamma_row(li1) * xhat1 + beta_row(li1)
        daf = dy_halo[:, 1:H + 1, 1:W + 1, :] \
            .astype(jnp.float32).reshape(N, nf)
        neg = bn1out < 0
        dal_ref[pl.ds(k, 1)] = jnp.sum(
            jnp.where(neg, daf * bn1out, 0.0), axis=0, keepdims=True)
        dbn1 = jnp.where(neg, alpha * daf, daf)
        s_db1 = jnp.sum(dbn1, axis=0, keepdims=True)
        s_dg1 = jnp.sum(dbn1 * xhat1, axis=0, keepdims=True)
        dy1 = (gamma_row(li1) * inv1) * (dbn1 - s_db1 / N
                                         - xhat1 * (s_dg1 / N))
        dg_ref[pl.ds(li1, 1)] = dg_ref[pl.ds(li1, 1)] + s_dg1
        dbt_ref[pl.ds(li1, 1)] = dbt_ref[pl.ds(li1, 1)] + s_db1
        db_ref[pl.ds(li1, 1)] = db_ref[pl.ds(li1, 1)] \
            + jnp.sum(dy1, axis=0, keepdims=True)
        dy_halo[:, 1:H + 1, 1:W + 1, :] = \
            dy1.reshape(B, H, W, nf).astype(dy_halo.dtype)

        # ---- stage 6/7: dW1; chain dx through conv1 + residual ----
        conv_wgrad(x_halo, li1)
        conv_data_into(dx_buf, li1, accumulate=True)

    @pl.when(i == n_blocks)
    def _final():
        # dL/dx0 = trunk-chain gradient + the global-skip passthrough
        dx0_ref[...] = dx_buf[...] + g_ref[...].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_blocks", "interpret", "cd"))
def _bwd_pallas(g, x_last, y_end, y1s, y2s, w_bwd, gamma_beta, alpha2d,
                mu, var, *, n_blocks, interpret, cd):
    B, H, W, nf = g.shape
    L = 2 * n_blocks + 1
    kern = functools.partial(_bwd_kernel, B=B, H=H, W=W, nf=nf,
                             n_blocks=n_blocks, cd=cd)
    full4 = lambda i: (0, 0, 0, 0)  # noqa: E731
    # step i>=1 reads block n_blocks-i; at i==0 fetch block n_blocks-1
    # (unused) to stay in range
    rev = lambda i: (n_blocks - jnp.maximum(i, 1), 0, 0, 0)  # noqa: E731
    outs = pl.pallas_call(
        kern,
        grid=(n_blocks + 1,),
        in_specs=[
            pl.BlockSpec((B, H, W, nf), full4, memory_space=pltpu.VMEM),  # g
            pl.BlockSpec((B, H, W, nf), full4, memory_space=pltpu.VMEM),  # x_last
            pl.BlockSpec((B, H, W, nf), full4, memory_space=pltpu.VMEM),  # y_end
            pl.BlockSpec((B, H, W, nf), rev, memory_space=pltpu.VMEM),    # y1s
            pl.BlockSpec((B, H, W, nf), rev, memory_space=pltpu.VMEM),    # y2s
            pl.BlockSpec(memory_space=pltpu.VMEM),                        # w_bwd
            pl.BlockSpec(memory_space=pltpu.VMEM),                        # gamma+beta
            pl.BlockSpec((n_blocks, 1), memory_space=pltpu.SMEM),         # alpha
            pl.BlockSpec(memory_space=pltpu.VMEM),                        # mu
            pl.BlockSpec(memory_space=pltpu.VMEM),                        # var
        ],
        out_specs=[
            pl.BlockSpec((B, H, W, nf), full4, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, nf), jnp.float32),        # dx0
            jax.ShapeDtypeStruct((L, 9 * nf, nf), jnp.float32),      # dw
            jax.ShapeDtypeStruct((L, nf), jnp.float32),              # dbias
            jax.ShapeDtypeStruct((L, nf), jnp.float32),              # dgamma
            jax.ShapeDtypeStruct((L, nf), jnp.float32),              # dbeta
            jax.ShapeDtypeStruct((max(n_blocks, 1), nf), jnp.float32),  # dalpha
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H + 2, W + 2, nf), jnp.float32),   # x_halo (chain)
            pltpu.VMEM((B, H, W, nf), jnp.float32),           # dx_buf
            pltpu.VMEM((B, H + 2, W + 2, nf), cd),            # dy_halo
            pltpu.VMEM((B, H + 2, W + 2, nf), cd),            # h_halo
            pltpu.VMEM((B, H, W, nf), cd),                    # xh_buf
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 2 ** 20,
        ),
        interpret=interpret,
    )(g, x_last, y_end, y1s, y2s, w_bwd, gamma_beta, alpha2d, mu, var)
    return outs


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def make_trunk_train(n_blocks: int, interpret: bool = False,
                     compute_dtype=jnp.bfloat16):
    """Returns trunk(x0, w, b, gamma, beta, alpha) -> (out, mu, var) with a
    pallas forward/backward. alpha is (n_blocks,). mu/var are
    non-differentiable outputs (zero cotangents assumed)."""
    cd = compute_dtype

    @jax.custom_vjp
    def trunk(x0, w, b, gamma, beta, alpha):
        out, *_rest, mu, var = _fwd_pallas(
            x0, w, b, gamma, beta, alpha.reshape(n_blocks, 1),
            n_blocks=n_blocks, interpret=interpret, cd=cd)
        return out, mu[:2 * n_blocks + 1], var[:2 * n_blocks + 1]

    def fwd(x0, w, b, gamma, beta, alpha):
        out, y1s, y2s, y_end, x_last, mu, var = _fwd_pallas(
            x0, w, b, gamma, beta, alpha.reshape(n_blocks, 1),
            n_blocks=n_blocks, interpret=interpret, cd=cd)
        L = 2 * n_blocks + 1
        res = (x_last, y_end, y1s, y2s, w, gamma, beta, alpha,
               mu[:L], var[:L])
        return (out, mu[:L], var[:L]), res

    def bwd(res, cts):
        g, _g_mu, _g_var = cts   # stat cotangents are zero by contract
        x_last, y_end, y1s, y2s, w, gamma, beta, alpha, mu, var = res
        w_bwd = rotate_io(w).astype(cd)
        gb = jnp.concatenate([gamma, beta], axis=0)
        dx0, dw, db, dgamma, dbeta, dal = _bwd_pallas(
            g, x_last, y_end, y1s, y2s, w_bwd, gb,
            alpha.reshape(n_blocks, 1), mu, var,
            n_blocks=n_blocks, interpret=interpret, cd=cd)
        # kernel stores per-channel partial sums; alpha is a scalar
        return dx0, dw, db, dgamma, dbeta, jnp.sum(dal, axis=1)

    trunk.defvjp(fwd, bwd)
    return trunk
