"""Alt progressive design: numeric parity vs a torch replica of the
reference module (model_generator_progressive.py:4-65) at x2/x4/x8, plus
the structural contracts (4x-shrinking channel ladder, trunk-end conv+BN,
nested-trunk reuse, per-level heads, prefix-head dropping)."""
import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from sisr_tpu.models.progressive import (
    out_features,
    progressive_apply,
    progressive_base_init,
    progressive_grow,
)
from sisr_tpu.nn.pytree import flatten_with_paths


def _copy_conv(conv: nn.Conv2d, p):
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(
            np.asarray(p["kernel"]).transpose(3, 2, 0, 1)))
        conv.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))


def _copy_prelu(m: nn.PReLU, p):
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(np.asarray(p["alpha"]).reshape(1)))


def _copy_bn(m: nn.BatchNorm2d, p, s):
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(np.asarray(p["scale"])))
        m.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
        m.running_mean.copy_(torch.from_numpy(np.asarray(s["mean"])))
        m.running_var.copy_(torch.from_numpy(np.asarray(s["var"])))


class _TorchBasicBlock(nn.Module):
    """reference model_generator_progressive.py:4-18 (no SN)."""

    def __init__(self, n, bp, bs):
        super().__init__()
        self.c1 = nn.Conv2d(n, n, 3, padding=1)
        self.b1 = nn.BatchNorm2d(n)
        self.a = nn.PReLU()
        self.c2 = nn.Conv2d(n, n, 3, padding=1)
        self.b2 = nn.BatchNorm2d(n)
        _copy_conv(self.c1, bp["conv1"]); _copy_bn(self.b1, bp["bn1"], bs["bn1"])
        _copy_prelu(self.a, bp["prelu"])
        _copy_conv(self.c2, bp["conv2"]); _copy_bn(self.b2, bp["bn2"], bs["bn2"])

    def forward(self, x):
        return x + self.b2(self.c2(self.a(self.b1(self.c1(x)))))


class _TorchProgBase(nn.Module):
    """reference GeneratorProgresiveBase (:21-44): stem + trunk + trunk-end
    conv/BN, sequenced with no global residual."""

    def __init__(self, params, state, n):
        super().__init__()
        self.first_conv = nn.Conv2d(3, n, 9, padding=4)
        self.first_act = nn.PReLU()
        _copy_conv(self.first_conv, params["first_layers"]["conv"])
        _copy_prelu(self.first_act, params["first_layers"]["prelu"])
        self.blocks = nn.ModuleList(
            [_TorchBasicBlock(n, bp, bs)
             for bp, bs in zip(params["blocks"], state["blocks"])])
        self.end_conv = nn.Conv2d(n, n, 3, padding=1)
        self.end_bn = nn.BatchNorm2d(n)
        _copy_conv(self.end_conv, params["block_list_end"]["conv"])
        _copy_bn(self.end_bn, params["block_list_end"]["bn"],
                 state["block_list_end"]["bn"])

    def forward(self, x):
        x = self.first_act(self.first_conv(x))
        for b in self.blocks:
            x = b(x)
        return self.end_bn(self.end_conv(x))


class _TorchSuffix(nn.Module):
    """reference GeneratorSuffix (:47-65): beginning = [prefix,
    conv n->n, PS(2), PReLU]; end = [conv n//4 -> 3, tanh]."""

    def __init__(self, prefix, params, n):
        super().__init__()
        up_conv = nn.Conv2d(n, n, 3, padding=1)
        up_act = nn.PReLU()
        _copy_conv(up_conv, params["upscale"]["conv"])
        _copy_prelu(up_act, params["upscale"]["prelu"])
        self.beginning = nn.Sequential(prefix, up_conv, nn.PixelShuffle(2),
                                       up_act)
        end_conv = nn.Conv2d(n // 4, 3, 3, padding=1)
        _copy_conv(end_conv, params["end"]["conv"])
        self.end = nn.Sequential(end_conv, nn.Tanh())

    def forward(self, x):
        return self.end(self.beginning(x))


def test_forward_parity_x2_x4_x8(rng):
    """Forward agreement with the torch replica at every growth level,
    train and eval mode, on the reference ladder 64 -> 16 -> 4
    (model_generator_progressive.py:70-73).

    Compared in float64 on both sides: at fp32 the XLA-vs-torch
    accumulation order on the 64-wide convs costs up to ~6e-3 absolute
    (train-mode BN divides by small batch vars, amplifying rounding), which
    would force a tolerance loose enough to hide real wiring bugs. In f64
    the replicas agree to ~1e-7 — an exactness statement."""
    key = jax.random.PRNGKey(0)
    base_params, base_state = progressive_base_init(key, n_blocks=2,
                                                    n_features=64)
    params, state = base_params, base_state

    x = rng.uniform(-1, 1, (2, 12, 12, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy()).double()

    def rebuild_torch(level_params):
        # fresh replica chain each level: a train-mode torch forward
        # mutates BN running stats, which would poison the next level's
        # eval comparison if the prefix modules were reused
        prefix = _TorchProgBase(base_params, base_state, 64).double()
        for p, n in zip(level_params, [64, 16, 4]):
            net = _TorchSuffix(prefix, p, n).double()
            prefix = net.beginning  # next level nests prefix.beginning
        return net

    level_params = []
    jax.config.update("jax_enable_x64", True)
    try:
        to64 = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), t)
        for level, n in enumerate([64, 16, 4]):
            assert out_features(params) == n
            key, k = jax.random.split(key)
            params, state = progressive_grow(k, params, state)
            level_params.append(params)
            for train in (False, True):
                net = rebuild_torch(level_params)
                ours, _ = progressive_apply(to64(params), to64(state),
                                            jnp.asarray(x, jnp.float64),
                                            train=train)
                net.train(train)
                with torch.no_grad():
                    ref = net(xt).numpy().transpose(0, 2, 3, 1)
                expect = 12 * 2 ** (level + 1)
                assert ours.shape == (2, expect, expect, 3)
                np.testing.assert_allclose(
                    np.asarray(ours), ref, rtol=0, atol=1e-6,
                    err_msg=f"level={level} train={train}")
    finally:
        jax.config.update("jax_enable_x64", False)


def test_channel_ladder_and_structure():
    """Per-level structural contracts: suffix conv is n->n (channels shrink
    4x per level), the previous level's head is dropped on growth, each
    level owns its own head, and the base keeps its trunk-end conv+BN."""
    key = jax.random.PRNGKey(0)
    params, state = progressive_base_init(key, n_blocks=1, n_features=64)
    assert params["block_list_end"]["conv"]["kernel"].shape == (3, 3, 64, 64)

    widths = []
    for _ in range(3):
        key, k = jax.random.split(key)
        n = out_features(params)
        widths.append(n)
        params, state = progressive_grow(k, params, state)
        assert params["upscale"]["conv"]["kernel"].shape == (3, 3, n, n)
        assert params["end"]["conv"]["kernel"].shape == (3, 3, n // 4, 3)
    assert widths == [64, 16, 4]  # reference self-test :70-73

    f = flatten_with_paths(params)
    assert "end/conv/kernel" in f
    # prefix heads are NOT nested (suffix wraps prefix.beginning only)
    assert "base/end/conv/kernel" not in f
    assert "base/base/end/conv/kernel" not in f
    assert "base/base/base/first_layers/conv/kernel" in f
    assert "base/base/base/block_list_end/conv/kernel" in f

    # width 1 is not divisible by 4: growth must refuse (reference :50)
    import pytest
    with pytest.raises(ValueError):
        progressive_grow(jax.random.PRNGKey(9), params, state)


def test_grown_level_reuses_trunk():
    """Growing must not copy or reinit the inner net: the nested subtrees
    are the SAME pytree objects (minus the dropped head)."""
    params, state = progressive_base_init(jax.random.PRNGKey(0), n_blocks=2,
                                          n_features=16)
    p1, s1 = progressive_grow(jax.random.PRNGKey(1), params, state)
    assert p1["base"] is params
    assert s1["base"] is state
    p2, s2 = progressive_grow(jax.random.PRNGKey(2), p1, s1)
    assert p2["base"]["base"] is params
    assert p2["base"]["upscale"] is p1["upscale"]
    assert s2["base"] is s1
