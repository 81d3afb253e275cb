"""Layer-level numerical parity vs torch for every primitive the models use."""
import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from sisr_tpu.nn.layers import (
    batchnorm_apply,
    batchnorm_init,
    conv2d_apply,
    conv2d_init,
    leaky_relu,
    linear_apply,
    linear_init,
    pixel_shuffle,
    prelu_apply,
    prelu_init,
)
from sisr_tpu.nn.spectral_norm import sn_init, sn_normalize
from sisr_tpu.nn.pytree import flatten_with_paths, unflatten_from_paths


def _to_torch_conv(params, stride=1, padding=1):
    kernel = np.asarray(params["kernel"])  # HWIO
    cout = kernel.shape[3]
    cin = kernel.shape[2]
    conv = nn.Conv2d(cin, cout, kernel.shape[0], stride=stride, padding=padding)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(kernel.transpose(3, 2, 0, 1)))
        conv.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))
    return conv


def test_conv_parity(rng):
    key = jax.random.PRNGKey(0)
    for stride, k in [(1, 3), (2, 3), (1, 9)]:
        p = conv2d_init(key, k, k, 8, 16)
        x = rng.standard_normal((2, 12, 12, 8)).astype(np.float32)
        y = np.asarray(conv2d_apply(p, jnp.asarray(x), stride=stride, padding=k // 2))
        conv = _to_torch_conv(p, stride=stride, padding=k // 2)
        ref = conv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
        np.testing.assert_allclose(y, ref.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


def test_conv_init_distribution():
    # torch default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    p = conv2d_init(jax.random.PRNGKey(1), 3, 3, 64, 64)
    bound = 1.0 / np.sqrt(64 * 9)
    k = np.asarray(p["kernel"])
    assert np.abs(k).max() <= bound
    assert np.abs(k).max() > 0.9 * bound


def test_linear_parity(rng):
    p = linear_init(jax.random.PRNGKey(0), 32, 8)
    x = rng.standard_normal((4, 32)).astype(np.float32)
    y = np.asarray(linear_apply(p, jnp.asarray(x)))
    lin = nn.Linear(32, 8)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).T))
        lin.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
    ref = lin(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)


def test_batchnorm_parity_train_and_eval(rng):
    p, s = batchnorm_init(6)
    x = rng.standard_normal((4, 5, 5, 6)).astype(np.float32) * 3 + 1

    bn = nn.BatchNorm2d(6)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    # two train steps: check normalized output and running-stat updates
    for _ in range(2):
        y, s = batchnorm_apply(p, s, jnp.asarray(x), train=True)
        ref = bn(xt).detach().numpy()
        np.testing.assert_allclose(np.asarray(y), ref.transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s["mean"]), bn.running_mean.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s["var"]), bn.running_var.numpy(),
                               rtol=1e-5, atol=1e-6)

    bn.eval()
    y, _ = batchnorm_apply(p, s, jnp.asarray(x), train=False)
    ref = bn(xt).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), ref.transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_prelu_and_leaky(rng):
    x = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    p = prelu_init()
    y = np.asarray(prelu_apply(p, jnp.asarray(x)))
    ref = nn.PReLU()(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-7)

    y = np.asarray(leaky_relu(jnp.asarray(x)))
    ref = nn.LeakyReLU()(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-7)


def test_pixel_shuffle_parity(rng):
    for r in (2, 3):
        x = rng.standard_normal((2, 4, 5, 6 * r * r)).astype(np.float32)
        y = np.asarray(pixel_shuffle(jnp.asarray(x), r))
        ref = nn.PixelShuffle(r)(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_array_equal(y, ref.numpy().transpose(0, 2, 3, 1))


def test_spectral_norm_parity_vs_torch(rng):
    """One power iteration per forward must match torch.nn.utils.spectral_norm."""
    p = conv2d_init(jax.random.PRNGKey(3), 3, 3, 4, 8)
    s = sn_init(jax.random.PRNGKey(4), p["kernel"])

    conv = _to_torch_conv(p)
    conv = nn.utils.spectral_norm(conv)
    # force identical starting u, v
    with torch.no_grad():
        conv.weight_u.copy_(torch.from_numpy(np.asarray(s["u"])))
        conv.weight_v.copy_(torch.from_numpy(np.asarray(s["v"])))

    x = rng.standard_normal((1, 6, 6, 4)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    for step in range(3):
        kernel, s = sn_normalize(p["kernel"], s, train=True)
        y = np.asarray(conv2d_apply(p, jnp.asarray(x), kernel_override=kernel, padding=1))
        ref = conv(xt).detach().numpy()  # train mode: power-iterates
        np.testing.assert_allclose(y, ref.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s["u"]), conv.weight_u.numpy(),
                                   rtol=1e-4, atol=1e-5)

    # eval: no update, sigma from stored vectors
    conv.eval()
    kernel, s2 = sn_normalize(p["kernel"], s, train=False)
    assert s2 is s
    y = np.asarray(conv2d_apply(p, jnp.asarray(x), kernel_override=kernel, padding=1))
    ref = conv(xt).detach().numpy()
    np.testing.assert_allclose(y, ref.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


def test_flatten_roundtrip():
    tree = {"a": {"b": jnp.ones(2)}, "list": [jnp.zeros(1), {"c": jnp.ones(3)}]}
    flat = flatten_with_paths(tree)
    assert set(flat) == {"a/b", "list/0", "list/1/c"}
    back = unflatten_from_paths(flat)
    assert isinstance(back["list"], list)
    np.testing.assert_array_equal(back["list"][1]["c"], tree["list"][1]["c"])
