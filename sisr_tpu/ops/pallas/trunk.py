"""Pallas kernel: the generator's entire residual trunk, VMEM-resident.

Deploy-mode (post-fold) inference spends most of its time in 33 small
3x3/64-channel convs (16 residual blocks x 2 + trunk end) at the LR spatial
size. Run one-by-one through XLA each conv is an HBM round trip at ~2 TF/s
(dispatch/memory bound — measured on v5e). This kernel keeps the activation
(and a ping-pong partner) in VMEM for the WHOLE trunk:

    for each block: y = prelu(conv1(x)); x = x + conv2(y)
    out = conv_end(x) + x0            (global residual, reference
                                       model_generator.py:86-96)

Preconditions: BN folded into conv weights (sisr_tpu.infer.fold_generator)
— valid for eval inference only. PReLU alphas are per-block scalars.

Layout: padded (H+2, W+2, 64) scratches with a permanently-zero 1px border
(SAME conv); each conv is 9 accumulated MXU dots of (H*W, 64) x (64, 64).
Weights for all 33 convs live in VMEM (~4.9 MB fp32 at nf=64).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv9(src_ref, w_ref, li: int, H: int, W: int, nf: int):
    """One 3x3 conv as a single im2col MXU dot: concatenating the 9 shifted
    windows on the lane axis gives K = 9*nf (576 at nf=64) — measured ~2x
    faster than 9 separate K=nf dots (which starve the 128-wide MXU)."""
    cols = [src_ref[dy:dy + H, dx:dx + W, :].reshape(H * W, nf)
            for dy in range(3) for dx in range(3)]
    patch = jnp.concatenate(cols, axis=1).astype(jnp.bfloat16)
    return jnp.dot(patch, w_ref[li], preferred_element_type=jnp.float32)


def _kernel(x_ref, w_ref, b_ref, a_ref, o_ref, buf_a, buf_b, *,
            H, W, nf, n_blocks):
    # init: interior of buf_a = input; borders of both buffers zero
    buf_a[...] = jnp.zeros((H + 2, W + 2, nf), jnp.float32)
    buf_b[...] = jnp.zeros((H + 2, W + 2, nf), jnp.float32)
    buf_a[1:H + 1, 1:W + 1, :] = x_ref[0].astype(jnp.float32)

    for blk in range(n_blocks):
        li1, li2 = 2 * blk, 2 * blk + 1
        y = _conv9(buf_a, w_ref, li1, H, W, nf) + b_ref[li1]
        alpha = a_ref[blk, 0]
        y = jnp.where(y >= 0, y, alpha * y)
        buf_b[1:H + 1, 1:W + 1, :] = y.reshape(H, W, nf)
        y2 = _conv9(buf_b, w_ref, li2, H, W, nf) + b_ref[li2]
        # local residual add (reference BasicBlock, model_generator.py:16-19)
        buf_a[1:H + 1, 1:W + 1, :] = (
            buf_a[1:H + 1, 1:W + 1, :] + y2.reshape(H, W, nf))

    # trunk end conv + global skip (reference model_generator.py:88-93)
    y = _conv9(buf_a, w_ref, 2 * n_blocks, H, W, nf) + b_ref[2 * n_blocks]
    out = y.reshape(H, W, nf) + x_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(x, w, b, alphas, *, interpret=False):
    B, H, W, nf = x.shape
    n_layers = w.shape[0]
    n_blocks = (n_layers - 1) // 2
    kern = functools.partial(_kernel, H=H, W=W, nf=nf, n_blocks=n_blocks)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, nf), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, nf), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((H + 2, W + 2, nf), jnp.float32),
            pltpu.VMEM((H + 2, W + 2, nf), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 2 ** 20),
        interpret=interpret,
    )(x, w, b, alphas)


def _conv9_tiled(src_ref, w_ref, li: int, T: int, H: int, W: int, nf: int):
    """Batch-tiled 3x3 conv: one im2col dot over T images at once, so the
    MXU sees M = T*H*W rows per dispatch (per-image M=1024 dots measured
    ~2x slower on v5e — the MXU pipeline never fills). K = 9*nf."""
    cols = [src_ref[:, dy:dy + H, dx:dx + W, :].reshape(T * H * W, nf)
            for dy in range(3) for dx in range(3)]
    patch = jnp.concatenate(cols, axis=1).astype(jnp.bfloat16)
    return jnp.dot(patch, w_ref[li], preferred_element_type=jnp.float32)


def _kernel_tiled(x_ref, w_ref, b_ref, a_ref, o_ref, buf_a, buf_b, *,
                  T, H, W, nf, n_blocks):
    """v2 schedule (round-4): batch-tiled grid + bf16 ping-pong buffers.

    The v1 kernel ran one image per program (M=1024 dots) with fp32
    scratches; it matched XLA (~30 TF/s) but no better. Two measured
    levers applied here:
      - grid over batch TILES: every conv dot gets M = T*1024 rows;
      - bf16 scratch buffers: the XLA path this kernel replaces already
        carries bf16 activations between convs (conv2d_apply output dtype
        == compute dtype), so bf16 residency is precision PARITY, halves
        VMEM traffic, and makes the im2col gather cast-free. Dots still
        accumulate fp32 (preferred_element_type) and the residual adds
        run in fp32 before the bf16 store.
    """
    zero = jnp.zeros((T, H + 2, W + 2, nf), jnp.bfloat16)
    buf_a[...] = zero
    buf_b[...] = zero
    buf_a[:, 1:H + 1, 1:W + 1, :] = x_ref[...].astype(jnp.bfloat16)

    for blk in range(n_blocks):
        li1, li2 = 2 * blk, 2 * blk + 1
        y = _conv9_tiled(buf_a, w_ref, li1, T, H, W, nf) + b_ref[li1]
        alpha = a_ref[blk, 0]
        y = jnp.where(y >= 0, y, alpha * y)
        buf_b[:, 1:H + 1, 1:W + 1, :] = (
            y.reshape(T, H, W, nf).astype(jnp.bfloat16))
        y2 = _conv9_tiled(buf_b, w_ref, li2, T, H, W, nf) + b_ref[li2]
        buf_a[:, 1:H + 1, 1:W + 1, :] = (
            buf_a[:, 1:H + 1, 1:W + 1, :].astype(jnp.float32)
            + y2.reshape(T, H, W, nf)).astype(jnp.bfloat16)

    y = _conv9_tiled(buf_a, w_ref, 2 * n_blocks, T, H, W, nf) \
        + b_ref[2 * n_blocks]
    out = y.reshape(T, H, W, nf) + x_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def _run_tiled(x, w, b, alphas, *, tile_b, interpret=False):
    B, H, W, nf = x.shape
    n_layers = w.shape[0]
    n_blocks = (n_layers - 1) // 2
    T = tile_b
    kern = functools.partial(_kernel_tiled, T=T, H=H, W=W, nf=nf,
                             n_blocks=n_blocks)
    return pl.pallas_call(
        kern,
        grid=(B // T,),
        in_specs=[
            pl.BlockSpec((T, H, W, nf), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, H, W, nf), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((T, H + 2, W + 2, nf), jnp.bfloat16),
            pltpu.VMEM((T, H + 2, W + 2, nf), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 2 ** 20),
        interpret=interpret,
    )(x, w, b, alphas)


def _pick_tile(B: int, max_t: int = 8) -> int:
    t = 1
    for c in range(1, max_t + 1):
        if B % c == 0:
            t = c
    return t


def fused_trunk(x, folded_params, *, tile_b: int = 1,
                interpret: bool = False):
    """Run the whole folded residual trunk on `x` (B, H, W, nf).

    `folded_params` is the generator params pytree AFTER fold_generator
    (BN identity); uses blocks[*]/{conv1,prelu,conv2} and block_end/conv.
    Returns conv_end(blocks(x)) + x.

    `tile_b`: images per grid step. 1 (default) = the measured v1 schedule
    (per-image, fp32 scratches); 0 = auto (largest divisor of B up to 8 —
    the v2 batch-tiled/bf16 schedule, opt-in until its on-chip design-point
    measurement lands: ADVICE r4, tools/bench_trunk_v2.py).
    """
    blocks = folded_params["blocks"]
    ws, bs, alphas = [], [], []
    for bp in blocks:
        for key in ("conv1", "conv2"):
            k = bp[key]["kernel"]
            ws.append(k.reshape(9, k.shape[2], k.shape[3]))
            bs.append(bp[key]["bias"])
        alphas.append(bp["prelu"]["alpha"].reshape(()))
    k = folded_params["block_end"]["conv"]["kernel"]
    ws.append(k.reshape(9, k.shape[2], k.shape[3]))
    bs.append(folded_params["block_end"]["conv"]["bias"])

    nf = ws[0].shape[1]
    # im2col weight layout (2n+1, 9*nf, nf), bf16 for the MXU
    w = jnp.stack(ws).reshape(len(ws), 9 * nf, nf).astype(jnp.bfloat16)
    b = jnp.stack(bs).astype(jnp.float32)          # (2n+1, nf)
    a = jnp.stack(alphas).astype(jnp.float32).reshape(-1, 1)  # (n, 1)
    if tile_b == 0:
        tile_b = _pick_tile(x.shape[0])
    if tile_b == 1:
        return _run(x, w, b, a, interpret=interpret)
    return _run_tiled(x, w, b, a, tile_b=tile_b, interpret=interpret)
