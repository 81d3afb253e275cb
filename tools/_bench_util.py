"""Shared chained-timing harness for the micro-benchmarks.

Methodology contract (CLAUDE.md "Benchmark methodology on the axon relay"):
un-chained repeated calls get deduplicated/pipelined by the remote runtime
and report impossible speeds, and `block_until_ready` alone can return
early. The only trustworthy loop shape is one where every iteration's
inputs depend on the previous iteration's *outputs* and the loop ends in a
`float()` device_get.

`chain_timed(fn, *args)` enforces both properties for any jittable fn:

- every output leaf is reduced into a scalar `acc` (so nothing the fn
  computes — including gradients it returns — can be dead-code-eliminated);
- one designated array argument is nudged by `1e-30 * acc` before the next
  call (a value change far below fp32/bf16 ulp, but a real data dependency
  the compiler cannot remove because `acc` is a runtime value);
- the loop ends with `float(acc)`.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def chain_timed(fn, *args, iters: int = 30, warm: int = 3,
                chain_arg: int = 0) -> float:
    """Seconds per call of `fn(*args)`, chained. `chain_arg` selects which
    positional argument (a jnp array) carries the iteration-to-iteration
    dependency."""

    def step(state):
        cur, _ = state
        out = fn(*cur)
        acc = jnp.zeros((), jnp.float32)
        for leaf in jax.tree_util.tree_leaves(out):
            acc = acc + jnp.sum(leaf.astype(jnp.float32))
        nxt = list(cur)
        a = nxt[chain_arg]
        nxt[chain_arg] = a + (1e-30 * acc).astype(a.dtype)
        return tuple(nxt), acc

    jf = jax.jit(step)
    state = (tuple(args), jnp.zeros((), jnp.float32))
    for _ in range(warm):
        state = jf(state)
    _ = float(state[1])                       # drain the warmup chain
    t0 = time.perf_counter()
    for _ in range(iters):
        state = jf(state)
    _ = float(state[1])                       # chain ends in a device_get
    return (time.perf_counter() - t0) / iters
