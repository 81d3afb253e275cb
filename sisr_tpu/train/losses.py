"""GAN + content losses.

Numerics match the reference's torch.nn.BCELoss applied to sigmoid outputs
(reference config.py:107, train.py:135,159,177) but are computed from logits
for stability: BCEWithLogits(l, y) == BCELoss(sigmoid(l), y) exactly (up to
torch's log clamp at -100, which only engages at |l| > 100 where both
formulations saturate).

Label conventions (reference config.py:184-189): real 1.0, one-sided
smoothed real 0.9 for D's real loss, fake 0.0.
"""
from __future__ import annotations

import jax.numpy as jnp


def bce_with_logits(logits, target: float):
    """Mean BCE of sigmoid(logits) against a constant target in [0, 1]."""
    l = logits.astype(jnp.float32)
    # max(l,0) - l*y + log(1 + exp(-|l|))
    loss = jnp.maximum(l, 0) - l * target + jnp.log1p(jnp.exp(-jnp.abs(l)))
    return jnp.mean(loss)


def content_loss(feat_a, feat_b):
    """mean((E(a) - E(b))^2) over extractor features
    (reference train.py:183-186)."""
    d = feat_a.astype(jnp.float32) - feat_b.astype(jnp.float32)
    return jnp.mean(jnp.square(d))
