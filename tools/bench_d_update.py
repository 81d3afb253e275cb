"""Time the full D-update block (12-slot vmapped fwd + param bwd, exactly
the train step's d_loss_fn) with the fused s2d stem ON vs OFF."""
from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import sisr_tpu.models.discriminator as D
from sisr_tpu.config import preset_x2_gan
from sisr_tpu.models.discriminator import (
    discriminator_apply,
    discriminator_init,
    discriminator_sn_update,
)


def main():
    cfg = preset_x2_gan("celeba")
    cfg = dataclasses.replace(
        cfg, generator=dataclasses.replace(cfg.generator, n_suffixes=1))
    dcfg = cfg.discriminator()
    params, state = discriminator_init(jax.random.PRNGKey(0), dcfg)
    rng = np.random.default_rng(0)
    B, R = 16, 10
    hr_s, _ = cfg.geometry()
    slots = jnp.asarray(
        rng.uniform(-1, 1, (R + 2, B, hr_s[1], hr_s[2], hr_s[0]))
        .astype(np.float32))
    smask = jnp.ones((R + 2,), jnp.float32)

    def d_loss(params_d, slots):
        st0 = discriminator_sn_update(params_d, state)
        d_out, _ = jax.vmap(
            lambda xb: discriminator_apply(params_d, st0, xb, train=True,
                                           cfg=dcfg,
                                           compute_dtype=jnp.bfloat16,
                                           return_logits=True,
                                           sn_train=False))(slots)
        probs = jax.nn.sigmoid(d_out)
        return jnp.sum(jnp.mean(probs, axis=1) * smask)

    from _bench_util import chain_timed

    for fuse in (False, True):
        D.FUSE_STEM = fuse
        # chained through the slots stack (tools/_bench_util): grads are in
        # the outputs (no DCE) and calls are serially dependent (no dedup)
        dt = chain_timed(jax.value_and_grad(d_loss), params, slots,
                         iters=20, chain_arg=1)
        print(json.dumps({f"d_update_ms_fuse_{fuse}": round(dt * 1e3, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
