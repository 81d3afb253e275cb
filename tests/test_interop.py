"""Torch-checkpoint import: build reference-shaped torch models (test
fixtures following the documented architecture, reference
model_generator.py:22-141 / model_discriminator.py:18-62), export their
state_dicts, import into our namespace, and require numerical agreement."""
import numpy as np
import torch
import torch.nn as nn
from torch.nn.utils import spectral_norm as tsn

import jax
import jax.numpy as jnp

from sisr_tpu.config import DiscriminatorConfig, GeneratorConfig
from sisr_tpu.interop import (
    import_discriminator_state_dict,
    import_generator_state_dict,
)
from sisr_tpu.checkpoint import transplant
from sisr_tpu.models.discriminator import discriminator_apply, discriminator_init
from sisr_tpu.models.generator import generator_apply, generator_init
from sisr_tpu.nn.pytree import unflatten_from_paths


def _torch_block(nf, use_sn):
    wrap = tsn if use_sn else (lambda m: m)
    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = nn.Sequential(
                wrap(nn.Conv2d(nf, nf, 3, padding=1)), nn.BatchNorm2d(nf),
                nn.PReLU(),
                wrap(nn.Conv2d(nf, nf, 3, padding=1)), nn.BatchNorm2d(nf))
        def forward(self, x):
            return x + self.layers(x)
    return Block()


def _torch_generator(n_blocks=2, nf=8, nl=16, use_sn=True, cin=3):
    wrap = tsn if use_sn else (lambda m: m)

    class Gen(nn.Module):
        def __init__(self):
            super().__init__()
            self.first_layers = nn.Sequential(
                wrap(nn.Conv2d(cin, nf, 9, padding=4)), nn.PReLU())
            self.block_list = nn.Sequential(
                *[_torch_block(nf, use_sn) for _ in range(n_blocks)])
            self.block_list_end = nn.Sequential(
                wrap(nn.Conv2d(nf, nf, 3, padding=1)), nn.BatchNorm2d(nf))
            self.upscale = nn.Sequential(nn.Sequential(
                wrap(nn.Conv2d(nf, nl, 3, padding=1)), nn.PixelShuffle(2),
                nn.PReLU()))
            self.end = nn.Sequential(
                wrap(nn.Conv2d(nl // 4, cin, 3, padding=1)), nn.Tanh())

        def forward(self, x):
            x = self.first_layers(x)
            res = x
            x = self.block_list(x)
            x = self.block_list_end(x) + res
            x = self.upscale(x)
            return self.end(x)

    return Gen()


def test_import_generator_with_spectral_norm(rng):
    net = _torch_generator(use_sn=True)
    # one train forward so torch's (u, v) power-iterate once (and BN stats move)
    x = rng.uniform(-1, 1, (2, 12, 12, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    net.train()
    with torch.no_grad():
        net(xt)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}

    imported = import_generator_state_dict(sd)
    gcfg = GeneratorConfig(n_blocks=2, n_features_block=8, n_features_last=16,
                           use_sn=True)
    params, state = generator_init(jax.random.PRNGKey(0), gcfg)
    params, rp = transplant(params, unflatten_from_paths(imported["params"]))
    state, rs = transplant(state, unflatten_from_paths(imported["state"]))
    assert rp.coverage == 1.0, rp
    assert rs.coverage == 1.0, rs

    # eval-mode comparison (torch eval uses stored u,v + running stats)
    net.eval()
    with torch.no_grad():
        ref = net(xt).numpy().transpose(0, 2, 3, 1)
    ours, _ = generator_apply(params, state, jnp.asarray(x), train=False,
                              cfg=gcfg)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-5)


def test_import_suffixed_generator(rng):
    """GeneratorSuffix nesting: base.* keys map under base/."""
    base = _torch_generator(use_sn=True)

    class Suffix(nn.Module):
        def __init__(self, prefix):
            super().__init__()
            self.base = prefix
            self.upscale = nn.Sequential(
                tsn(nn.Conv2d(4, 16, 3, padding=1)), nn.PixelShuffle(2),
                nn.PReLU())
            self.end = [prefix.end]  # shared, hidden from params

        def forward(self, x):
            x = self.base.first_layers(x)
            res = x
            x = self.base.block_list(x)
            x = self.base.block_list_end(x) + res
            x = self.base.upscale(x)
            x = self.upscale(x)
            return self.end[0](x)

    net = Suffix(base)
    x = rng.uniform(-1, 1, (1, 8, 8, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    net.train()
    with torch.no_grad():
        net(xt)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    imported = import_generator_state_dict(sd)

    gcfg = GeneratorConfig(n_blocks=2, n_features_block=8, n_features_last=16,
                           use_sn=True, n_suffixes=1)
    params, state = generator_init(jax.random.PRNGKey(0), gcfg)
    params, rp = transplant(params, unflatten_from_paths(imported["params"]))
    state, rs = transplant(state, unflatten_from_paths(imported["state"]))
    assert rp.coverage == 1.0, rp

    net.eval()
    with torch.no_grad():
        ref = net(xt).numpy().transpose(0, 2, 3, 1)
    ours, _ = generator_apply(params, state, jnp.asarray(x), train=False,
                              cfg=gcfg)
    assert ours.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-5)


def test_import_discriminator(rng):
    nfs, strides = (8, 8, 16), (1, 2, 2)

    class Disc(nn.Module):
        def __init__(self):
            super().__init__()
            blocks = []
            for i in range(1, len(nfs)):
                class B(nn.Module):
                    def __init__(self, cin, cout, s):
                        super().__init__()
                        self.layers = nn.Sequential(
                            tsn(nn.Conv2d(cin, cout, 3, stride=s, padding=1)),
                            nn.BatchNorm2d(cout), nn.LeakyReLU())
                    def forward(self, x):
                        return self.layers(x)
                blocks.append(B(nfs[i - 1], nfs[i], strides[i]))
            self.conv = nn.Sequential(
                tsn(nn.Conv2d(3, nfs[0], 3, stride=strides[0], padding=1)),
                nn.LeakyReLU(), nn.Sequential(*blocks))
            self.fc = nn.Sequential(nn.Linear(16 * 4 * 4, 32), nn.LeakyReLU(),
                                    nn.Linear(32, 1), nn.Sigmoid())

        def forward(self, x):
            h = self.conv(x)
            h = h.reshape(x.shape[0], -1)  # torch (C,H,W) flatten
            return self.fc(h)

    net = Disc()
    x = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    net.train()
    with torch.no_grad():
        net(xt)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    imported = import_discriminator_state_dict(sd, (16, 16), nfs, strides)

    dcfg = DiscriminatorConfig(input_shape=(3, 16, 16), list_n_features=nfs,
                               list_stride=strides)
    params, state = discriminator_init(jax.random.PRNGKey(0), dcfg)
    params, rp = transplant(params, unflatten_from_paths(imported["params"]))
    state, rs = transplant(state, unflatten_from_paths(imported["state"]))
    assert rp.coverage == 1.0, rp

    net.eval()
    with torch.no_grad():
        ref = net(xt).numpy().reshape(-1)
    ours, _ = discriminator_apply(params, state, jnp.asarray(x), train=False,
                                  cfg=dcfg)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-5)
