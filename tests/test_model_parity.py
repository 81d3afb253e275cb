"""Full-model numerical parity vs torch replicas.

These tests assemble reference-architecture torch models (SRGAN generator /
discriminator recipes, reference model_generator.py:22-63 and
model_discriminator.py:18-53) as *test fixtures*, load our parameters into
them, and require the forward passes to agree. This catches wiring bugs
(residual placement, PReLU sharing, pixel-shuffle ordering, flatten layout)
that layer-level tests cannot.
"""
import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from sisr_tpu.config import DiscriminatorConfig, GeneratorConfig
from sisr_tpu.models.discriminator import discriminator_apply, discriminator_init
from sisr_tpu.models.generator import generator_apply, generator_init, grow_suffix


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


def _sn_wrap(conv: nn.Conv2d, s):
    """Apply torch spectral_norm and seed its (u, v) from our carried state."""
    conv = nn.utils.spectral_norm(conv)
    with torch.no_grad():
        conv.weight_u.copy_(torch.from_numpy(np.asarray(s["u"])))
        conv.weight_v.copy_(torch.from_numpy(np.asarray(s["v"])))
    return conv


class _TorchGen(nn.Module):
    """Reference-recipe generator at use_sn=False: SN still wraps the stem,
    block, and trunk-end convs (reference model_generator.py:10,13,33,39);
    upscale/end are plain convs. n_blocks=2, nf=8, nl=16, x2."""

    def __init__(self, params, state):
        super().__init__()
        self.first_conv = nn.Conv2d(3, 8, 9, padding=4)
        self.first_act = nn.PReLU()
        _copy_conv(self.first_conv, params["first_layers"]["conv"])
        _copy_prelu(self.first_act, params["first_layers"]["prelu"])
        self.first_conv = _sn_wrap(self.first_conv,
                                   state["first_layers"]["conv"])

        self.blocks = nn.ModuleList()
        for bp, bs in zip(params["blocks"], state["blocks"]):
            c1 = nn.Conv2d(8, 8, 3, padding=1)
            b1 = nn.BatchNorm2d(8)
            a = nn.PReLU()
            c2 = nn.Conv2d(8, 8, 3, padding=1)
            b2 = nn.BatchNorm2d(8)
            _copy_conv(c1, bp["conv1"]); _copy_bn(b1, bp["bn1"], bs["bn1"])
            _copy_prelu(a, bp["prelu"])
            _copy_conv(c2, bp["conv2"]); _copy_bn(b2, bp["bn2"], bs["bn2"])
            c1 = _sn_wrap(c1, bs["conv1"]); c2 = _sn_wrap(c2, bs["conv2"])
            self.blocks.append(nn.ModuleList([c1, b1, a, c2, b2]))

        self.end_conv = nn.Conv2d(8, 8, 3, padding=1)
        self.end_bn = nn.BatchNorm2d(8)
        _copy_conv(self.end_conv, params["block_end"]["conv"])
        _copy_bn(self.end_bn, params["block_end"]["bn"], state["block_end"]["bn"])
        self.end_conv = _sn_wrap(self.end_conv, state["block_end"]["conv"])

        self.up_conv = nn.Conv2d(8, 16, 3, padding=1)
        self.up_ps = nn.PixelShuffle(2)
        self.up_act = nn.PReLU()
        _copy_conv(self.up_conv, params["upscale"][0]["conv"])
        _copy_prelu(self.up_act, params["upscale"][0]["prelu"])

        self.out_conv = nn.Conv2d(4, 3, 3, padding=1)
        _copy_conv(self.out_conv, params["end"]["conv"])

    def forward(self, x):
        x = self.first_act(self.first_conv(x))
        residual = x
        for c1, b1, a, c2, b2 in self.blocks:
            x = x + b2(c2(a(b1(c1(x)))))
        x = self.end_bn(self.end_conv(x)) + residual
        x = self.up_act(self.up_ps(self.up_conv(x)))
        return torch.tanh(self.out_conv(x))


def test_generator_forward_parity_train_and_eval(rng):
    gcfg = GeneratorConfig(n_blocks=2, n_features_block=8, n_features_last=16,
                           use_sn=False)
    params, state = generator_init(jax.random.PRNGKey(0), gcfg)
    net = _TorchGen(params, state)
    x = rng.uniform(-1, 1, (2, 12, 12, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    # eval first: a torch train-mode forward mutates BN running stats, which
    # would poison a later eval comparison
    for train in (False, True):
        ours, _ = generator_apply(params, state, jnp.asarray(x), train=train,
                                  cfg=gcfg)
        net.train(train)
        with torch.no_grad():
            ref = net(xt).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3,
                                   atol=1e-5, err_msg=f"train={train}")


def test_suffix_shares_end_conv(rng):
    """The grown net's output conv must be the prefix's (reference
    GeneratorSuffix list trick, model_generator.py:127-128): perturbing
    base/end/conv changes the suffixed output."""
    gcfg = GeneratorConfig(n_blocks=2, n_features_block=8, n_features_last=16,
                           use_sn=False)
    p2, s2 = generator_init(jax.random.PRNGKey(0), gcfg)
    p4, s4 = grow_suffix(jax.random.PRNGKey(1), p2, s2, gcfg)
    g4 = GeneratorConfig(n_blocks=2, n_features_block=8, n_features_last=16,
                         use_sn=False, n_suffixes=1)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 8, 8, 3)).astype(np.float32))
    y1, _ = generator_apply(p4, s4, x, train=False, cfg=g4)

    import copy
    p4b = copy.deepcopy(jax.tree_util.tree_map(np.asarray, p4))
    p4b["base"]["end"]["conv"]["bias"] = \
        p4b["base"]["end"]["conv"]["bias"] + 0.5
    y2, _ = generator_apply(p4b, s4, x, train=False, cfg=g4)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    assert y1.shape == (1, 32, 32, 3)  # x4


class _TorchDisc(nn.Module):
    """Reference-recipe discriminator with spectral norm, small ladder."""

    def __init__(self, params, state, nfs, strides, fc_in):
        super().__init__()
        convs = []
        c0 = nn.Conv2d(3, nfs[0], 3, stride=strides[0], padding=1)
        _copy_conv(c0, params["stem"]["conv"])
        c0 = nn.utils.spectral_norm(c0)
        with torch.no_grad():
            c0.weight_u.copy_(torch.from_numpy(np.asarray(state["stem"]["conv"]["u"])))
            c0.weight_v.copy_(torch.from_numpy(np.asarray(state["stem"]["conv"]["v"])))
        self.stem = c0
        self.blocks = nn.ModuleList()
        for i in range(1, len(nfs)):
            c = nn.Conv2d(nfs[i - 1], nfs[i], 3, stride=strides[i], padding=1)
            _copy_conv(c, params["blocks"][i - 1]["conv"])
            c = nn.utils.spectral_norm(c)
            with torch.no_grad():
                c.weight_u.copy_(torch.from_numpy(
                    np.asarray(state["blocks"][i - 1]["conv"]["u"])))
                c.weight_v.copy_(torch.from_numpy(
                    np.asarray(state["blocks"][i - 1]["conv"]["v"])))
            b = nn.BatchNorm2d(nfs[i])
            _copy_bn(b, params["blocks"][i - 1]["bn"],
                     state["blocks"][i - 1]["bn"])
            self.blocks.append(nn.ModuleList([c, b]))
        self.fc1 = nn.Linear(fc_in, nfs[-1] * 2)
        self.fc2 = nn.Linear(nfs[-1] * 2, 1)
        with torch.no_grad():
            self.fc1.weight.copy_(torch.from_numpy(np.asarray(params["fc1"]["kernel"]).T))
            self.fc1.bias.copy_(torch.from_numpy(np.asarray(params["fc1"]["bias"])))
            self.fc2.weight.copy_(torch.from_numpy(np.asarray(params["fc2"]["kernel"]).T))
            self.fc2.bias.copy_(torch.from_numpy(np.asarray(params["fc2"]["bias"])))
        self.act = nn.LeakyReLU()

    def forward(self, x):
        h = self.act(self.stem(x))
        for c, b in self.blocks:
            h = self.act(b(c(h)))
        # NHWC flatten to match our layout
        h = h.permute(0, 2, 3, 1).reshape(x.shape[0], -1)
        return torch.sigmoid(self.fc2(self.act(self.fc1(h))))


def test_discriminator_forward_parity(rng):
    dcfg = DiscriminatorConfig(input_shape=(3, 16, 16),
                               list_n_features=(8, 8, 16),
                               list_stride=(1, 2, 2))
    params, state = discriminator_init(jax.random.PRNGKey(0), dcfg)
    net = _TorchDisc(params, state, dcfg.list_n_features, dcfg.list_stride,
                     dcfg.fc_in)
    x = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    ours, _ = discriminator_apply(params, state, jnp.asarray(x), train=True,
                                  cfg=dcfg)
    net.train(True)
    with torch.no_grad():
        ref = net(xt).numpy().reshape(-1)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-5)


def test_sn_gating_matches_reference():
    """use_sn=False still spectral-norms the trunk (reference
    model_generator.py:10,13,33,39 wrap stem/blocks/trunk-end in sn()
    unconditionally); use_sn gates only the upscale and end convs (:43-63)."""
    for use_sn in (False, True):
        gcfg = GeneratorConfig(n_blocks=2, n_features_block=8,
                               n_features_last=16, use_sn=use_sn)
        _, state = generator_init(jax.random.PRNGKey(0), gcfg)
        assert "u" in state["first_layers"]["conv"]
        assert "u" in state["blocks"][0]["conv1"]
        assert "u" in state["blocks"][1]["conv2"]
        assert "u" in state["block_end"]["conv"]
        gated = ("u" in state["upscale"][0]["conv"],
                 "u" in state["end"]["conv"])
        assert gated == (use_sn, use_sn)
