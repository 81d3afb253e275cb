"""Spectral normalization as explicit (u, v) power-iteration state.

The reference wraps nearly every conv in torch.nn.utils.spectral_norm
(model_generator.py:3,10,13,...; model_discriminator.py:2,10,39), which runs
one power iteration per forward in train mode via a module hook. Under jit we
carry (u, v) in the model state pytree instead, updating them functionally —
this also fixes by construction the reference's known checkpoint bug where
SN's renamed buffers break load_state_dict(strict=False)
(reference config.py:62, model_generator.py:191).

Semantics match torch:
  train: v = normalize(W_mat^T u); u' = normalize(W_mat v);
         sigma = u'^T W_mat v;  W_norm = W / sigma;  state <- (u', v)
  eval:  sigma from stored (u, v), no update.
with eps=1e-12 normalization.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _l2norm(x):
    return x / (jnp.linalg.norm(x) + _EPS)


def _as_mat(kernel):
    """Flatten a conv kernel to torch's (out, in*kh*kw) view.

    Torch reshapes its (O, I, kh, kw) weight to (O, -1); our HWIO kernel
    permuted to OIHW then flattened gives the identical matrix, so (u, v)
    states are interchangeable with torch checkpoints.
    """
    if kernel.ndim == 4:  # HWIO -> OIHW -> (O, I*kh*kw)
        o = kernel.shape[3]
        return jnp.transpose(kernel, (3, 2, 0, 1)).reshape(o, -1)
    if kernel.ndim == 2:  # (in, out) -> (out, in)
        return kernel.T
    return kernel.reshape(kernel.shape[0], -1)


def sn_init(key, kernel, n_power_iterations: int = 15):
    """Initial (u, v) vectors: normalized gaussian, then a burn-in of power
    iterations (like torch.nn.utils.parametrizations.spectral_norm, which
    runs 15 at init). Without burn-in, a fresh net run in eval mode divides
    by a near-zero sigma estimate and overflows through the 16-block trunk —
    the legacy torch API has the same hazard; we fix it by construction."""
    w = _as_mat(kernel).astype(jnp.float32)
    k1, k2 = jax.random.split(key)
    u = _l2norm(jax.random.normal(k1, (w.shape[0],), jnp.float32))
    v = _l2norm(jax.random.normal(k2, (w.shape[1],), jnp.float32))
    for _ in range(n_power_iterations):
        v = _l2norm(w.T @ u)
        u = _l2norm(w @ v)
    return {"u": u, "v": v}


def sn_normalize(kernel, state, *, train: bool):
    """Return (normalized_kernel, new_state)."""
    w = _as_mat(kernel).astype(jnp.float32)
    u, v = state["u"], state["v"]
    if train:
        v = _l2norm(w.T @ u)
        u = _l2norm(w @ v)
        # one power iteration per forward; gradients must not flow into u,v
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        new_state = {"u": u, "v": v}
    else:
        new_state = state
    sigma = jnp.dot(u, w @ v)
    return kernel / sigma.astype(kernel.dtype), new_state
