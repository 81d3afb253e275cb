"""Optimizers: two independent Adams with per-iteration exponential LR decay
and path-prefix freeze masks.

Parity notes:
- Adam(lr=1e-5, betas=(.9,.999), eps=1e-8) exactly as reference
  config.py:292-304 (optax.scale_by_adam matches torch's update).
- LR decay: the reference steps LambdaLR(f**iteration) every *iteration*
  (train.py:121-122) with f = 0.1 ** (1/(n_batch*num_epochs)) — a smooth 10x
  decay over the run (config.py:170-180). Crucially both schedulers step
  even on iterations where that network is not updated, so the decay follows
  the global step counter, not the per-optimizer update count. We therefore
  drive the schedule from TrainState.step, not from optax's internal count.
- Freezing (reference Generator.freeze / GeneratorSuffix freeze_prefix,
  model_generator.py:103-131) is a pytree mask by path prefix; frozen
  leaves' grads are zeroed *before* Adam so their moments stay zero and the
  params are bit-frozen (mirrors requires_grad=False).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from sisr_tpu.nn.pytree import flatten_with_paths, unflatten_from_paths


def make_lr_schedule(base_lr: float, total_steps: int, decay: bool):
    """lr(t) = base_lr * (0.1 ** (t / total_steps)) if decay else base_lr."""
    if not decay:
        return lambda step: jnp.asarray(base_lr, jnp.float32)
    f = 0.1 ** (1.0 / max(total_steps, 1))

    def schedule(step):
        return jnp.asarray(base_lr, jnp.float32) * jnp.power(
            jnp.asarray(f, jnp.float32), step.astype(jnp.float32))

    return schedule


def trainable_mask(params, freeze_prefixes: Sequence[str]):
    """Pytree of bools matching params: False where the flat path starts with
    any freeze prefix."""
    flat = flatten_with_paths(params)
    mask = {}
    for path in flat:
        frozen = any(path == p or path.startswith(p + "/") for p in freeze_prefixes)
        mask[path] = not frozen
    return unflatten_from_paths(mask)


def make_adam(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    return optax.scale_by_adam(b1=b1, b2=b2, eps=eps)


def adam_update(opt, opt_state, grads, params, lr_t, mask=None):
    """One Adam step at learning rate lr_t (a traced scalar).

    Returns (new_params, new_opt_state). Frozen leaves (mask=False) keep
    zero grads and therefore zero moments and zero update.
    """
    if mask is not None:
        grads = jax.tree_util.tree_map(
            lambda g, m: g if m else jnp.zeros_like(g), grads, mask)
    updates, opt_state = opt.update(grads, opt_state, params)
    updates = jax.tree_util.tree_map(lambda u: -lr_t * u, updates)
    params = optax.apply_updates(params, updates)
    return params, opt_state
