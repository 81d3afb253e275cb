"""Alt progressive design shape tests (reference
model_generator_progressive.py:67-89 self-test: nested x2/x4/x8 nets on a
(1,3,32,32) input)."""
import numpy as np

import jax
import jax.numpy as jnp

from sisr_tpu.models.progressive import (
    progressive_apply,
    progressive_base_init,
    progressive_grow,
)
from sisr_tpu.nn.pytree import flatten_with_paths


def test_nested_x2_x4_x8_shapes(rng):
    key = jax.random.PRNGKey(0)
    params, state = progressive_base_init(key, n_blocks=2, n_features=8)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))

    outs = []
    for level in range(3):
        key, k = jax.random.split(key)
        params, state = progressive_grow(k, params, state, n_features=8,
                                         n_features_up=16)
        y, _ = progressive_apply(params, state, x, train=True)
        outs.append(y)
        expect = 32 * 2 ** (level + 1)
        assert y.shape == (1, expect, expect, 3), y.shape
        assert float(jnp.abs(y).max()) <= 1.0  # tanh head per level

    # each level owns its own head (no sharing, unlike the main design)
    f = flatten_with_paths(params)
    assert "end/conv/kernel" in f
    assert "base/end/conv/kernel" in f
    assert "base/base/end/conv/kernel" in f
    # x2 weights nested verbatim under base/base
    assert "base/base/base/first_layers/conv/kernel" in f


def test_grown_level_reuses_trunk(rng):
    """Growing must not copy or reinit the inner net: the nested subtree is
    the SAME pytree object."""
    params, state = progressive_base_init(jax.random.PRNGKey(0), n_blocks=2,
                                          n_features=8)
    p1, s1 = progressive_grow(jax.random.PRNGKey(1), params, state,
                              n_features=8, n_features_up=16)
    assert p1["base"] is params
    p2, _ = progressive_grow(jax.random.PRNGKey(2), p1, s1, n_features=8,
                             n_features_up=16)
    assert p2["base"] is p1
