"""MaskedVGG parity tests (reference model_content_extractor.py:75-108
_test_base/_test_mask, upgraded to numerical parity vs torch)."""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from sisr_tpu.models.vgg import (
    VGGConfig,
    vgg_apply,
    vgg_feature_size,
    vgg_init,
)

_CFG_E = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
          512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def _torch_vgg19_features(params):
    """torchvision-shaped VGG19 features stack carrying our random weights."""
    layers = []
    cin = 3
    ci = 0
    for v in _CFG_E:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            conv = nn.Conv2d(cin, v, 3, padding=1)
            if ci < len(params["convs"]):
                k = np.asarray(params["convs"][ci]["kernel"])
                b = np.asarray(params["convs"][ci]["bias"])
                with torch.no_grad():
                    conv.weight.copy_(torch.from_numpy(k.transpose(3, 2, 0, 1)))
                    conv.bias.copy_(torch.from_numpy(b))
            layers.append(conv)
            layers.append(nn.ReLU(inplace=False))
            cin = v
            ci += 1
    return nn.Sequential(*layers)


def test_masked_vgg_numerical_parity(rng):
    """Our masked multi-tap forward == torch stack evaluated at the
    pre-activation tap indices [3,8,17,26]-1 (0-based 2,7,16,25)."""
    cfg = VGGConfig(mask=0b01111)
    params = vgg_init(jax.random.PRNGKey(0), cfg)
    net = _torch_vgg19_features(params)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)

    ours = np.asarray(vgg_apply(params, jnp.asarray(x), cfg))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    saved = []
    h = xt
    for i, l in enumerate(net):
        h = l(h)
        if i in (2, 7, 16, 25):  # pre-activation taps
            saved.append(h)
    # reference concatenates NCHW-flattened taps; ours NHWC-flattened.
    # compare per-tap tensors, not the concat ordering.
    ofs = 0
    for t in saved:
        tn = t.detach().numpy().transpose(0, 2, 3, 1)
        width = tn[0].size
        np.testing.assert_allclose(
            ours[:, ofs:ofs + width], tn.reshape(2, -1), rtol=1e-4, atol=1e-4)
        ofs += width
    assert ofs == ours.shape[1]


def test_truncation_lengths():
    # reference _test_base: mask 0b00011 / 0b00010 -> 9 layers; 0b00110 -> 18
    assert VGGConfig(0b00011).truncate_at() == 7   # 0-based conv idx 7 == 1-based 8
    assert VGGConfig(0b00010).truncate_at() == 7
    assert VGGConfig(0b00110).truncate_at() == 16
    assert VGGConfig(0b01111).n_convs() == 12
    assert VGGConfig(0b00001).n_convs() == 2


@pytest.mark.parametrize("mask", [0b00001, 0b00010, 0b00101, 0b01111, 0b11111])
def test_all_masks_size_prediction(mask, rng):
    """reference _test_mask: output width equals analytic get_size for
    every mask."""
    cfg = VGGConfig(mask)
    params = vgg_init(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    feats = vgg_apply(params, x, cfg)
    assert feats.shape == (1, vgg_feature_size((64, 64), mask))


def test_maxpool_truncates_odd_dims(rng):
    """reference _test_base: MaxPool2d halves and truncates odd dims."""
    cfg = VGGConfig(0b00010)  # needs pool1 before tap2
    params = vgg_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 33, 33, 3)).astype(np.float32))
    maps = vgg_apply(params, x, cfg, flatten=False)
    assert maps[0].shape == (1, 16, 16, 128)


def test_port_tool_roundtrip(tmp_path, rng):
    """Fabricate a torchvision-style state_dict, port it, load it, and check
    numerical parity of the loaded extractor."""
    import sys
    sys.path.insert(0, "tools")
    from port_vgg_weights import convert_state_dict

    sd = {}
    cin = 3
    li = 0
    for v in _CFG_E:
        if v == "M":
            li += 1
            continue
        sd[f"features.{li}.weight"] = torch.randn(v, cin, 3, 3)
        sd[f"features.{li}.bias"] = torch.randn(v)
        cin = v
        li += 2
    npz = convert_state_dict(sd)
    path = str(tmp_path / "vgg.npz")
    np.savez(path, **npz)

    cfg = VGGConfig(0b00011)
    params = vgg_init(path, cfg)
    assert len(params["convs"]) == 4  # convs up to tap at layer idx 7
    np.testing.assert_allclose(
        np.asarray(params["convs"][0]["kernel"]),
        sd["features.0.weight"].numpy().transpose(2, 3, 1, 0))


def test_port_tool_end_to_end_forward_parity(tmp_path, rng):
    """The full port path the reference exercises at runtime
    (model_content_extractor.py:43): a torchvision-shaped state_dict goes
    through tools/port_vgg_weights.py to an .npz, vgg_init loads the .npz,
    and the JAX forward matches the torch features stack carrying the SAME
    state_dict — so a real pretrained vgg19.pth ported offline reproduces
    the reference's perceptual features exactly."""
    import sys
    sys.path.insert(0, "tools")
    from port_vgg_weights import convert_state_dict

    gen = torch.Generator().manual_seed(7)
    sd = {}
    cin = 3
    li = 0
    for v in _CFG_E:
        if v == "M":
            li += 1
            continue
        # pretrained-like magnitudes so deep activations stay finite
        sd[f"features.{li}.weight"] = torch.randn(v, cin, 3, 3, generator=gen) * 0.05
        sd[f"features.{li}.bias"] = torch.randn(v, generator=gen) * 0.05
        cin = v
        li += 2
    path = str(tmp_path / "vgg19.npz")
    np.savez(path, **convert_state_dict(sd))

    cfg = VGGConfig(0b01111)  # the reference's default 4-tap mask
    params = vgg_init(path, cfg)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(vgg_apply(params, jnp.asarray(x), cfg))

    layers, cin, li = [], 3, 0
    for v in _CFG_E:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
            li += 1
            continue
        conv = nn.Conv2d(cin, v, 3, padding=1)
        with torch.no_grad():
            conv.weight.copy_(sd[f"features.{li}.weight"])
            conv.bias.copy_(sd[f"features.{li}.bias"])
        layers.append(conv)
        layers.append(nn.ReLU(inplace=False))
        cin = v
        li += 2
    h = torch.from_numpy(x.transpose(0, 3, 1, 2))
    saved = []
    for i, l in enumerate(nn.Sequential(*layers)):
        h = l(h)
        if i in (2, 7, 16, 25):  # pre-activation taps
            saved.append(h.detach().numpy().transpose(0, 2, 3, 1))
    ofs = 0
    for tn in saved:
        width = tn[0].size
        np.testing.assert_allclose(
            ours[:, ofs:ofs + width], tn.reshape(2, -1), rtol=1e-4, atol=1e-4)
        ofs += width
    assert ofs == ours.shape[1]
