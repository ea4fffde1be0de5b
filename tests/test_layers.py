"""Layer parity vs torch: BatchNorm semantics, pointwise conv == Linear,
attention pooling (incl. the degenerate FusionModule variant), conv2d."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from mmego_tpu.nn import layers


def test_bn_eval_matches_torch_running_stats():
    torch.manual_seed(0)
    m = torch.nn.BatchNorm1d(8)
    # give it non-trivial running stats + affine params
    m.running_mean.data = torch.randn(8)
    m.running_var.data = torch.rand(8) + 0.5
    m.weight.data = torch.randn(8)
    m.bias.data = torch.randn(8)
    m.eval()
    x = np.random.RandomState(0).randn(6, 8, 11).astype(np.float32)  # (B, C, N)
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    p = {"scale": jnp.asarray(m.weight.detach().numpy()),
         "bias": jnp.asarray(m.bias.detach().numpy())}
    s = {"mean": jnp.asarray(m.running_mean.numpy()),
         "var": jnp.asarray(m.running_var.numpy())}
    # ours is feature-last: (B, N, C)
    got, _ = layers.bn_apply(p, s, jnp.asarray(x.transpose(0, 2, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-5)


def test_bn_train_matches_torch_batch_stats_and_running_update():
    torch.manual_seed(1)
    m = torch.nn.BatchNorm1d(4)
    m.train()
    x = np.random.RandomState(1).randn(5, 4, 7).astype(np.float32)
    want = m(torch.from_numpy(x)).detach().numpy()
    p = {"scale": jnp.asarray(m.weight.detach().numpy()),
         "bias": jnp.asarray(m.bias.detach().numpy())}
    s = {"mean": jnp.zeros(4), "var": jnp.ones(4)}
    got, new_s = layers.bn_apply(p, s, jnp.asarray(x.transpose(0, 2, 1)), train=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_s["mean"]), m.running_mean.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_s["var"]), m.running_var.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_pointwise_conv_equals_conv1d():
    torch.manual_seed(2)
    conv = torch.nn.Conv1d(6, 8, kernel_size=1)
    x = np.random.RandomState(2).randn(3, 6, 10).astype(np.float32)
    with torch.no_grad():
        want = conv(torch.from_numpy(x)).numpy()           # (B, 8, N)
    p = {"w": jnp.asarray(conv.weight.detach().numpy()[:, :, 0].T),
         "b": jnp.asarray(conv.bias.detach().numpy())}
    got = layers.linear_apply(p, jnp.asarray(x.transpose(0, 2, 1)))  # (B, N, 8)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-5)


def test_attn_pool_normalized():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 7, 5).astype(np.float32)
    p = layers.attn_pool_init(jax.random.PRNGKey(0), 5)
    got = np.asarray(layers.attn_pool_apply(p, jnp.asarray(x)))
    w = np.asarray(layers.linear_apply(
        {k: np.asarray(v) for k, v in p["attn"].items()}, jnp.asarray(x)))
    w = np.exp(w) / np.exp(w).sum(axis=1, keepdims=True)
    np.testing.assert_allclose(got, (x * w).sum(axis=1), rtol=1e-5, atol=1e-5)


def test_attn_pool_degenerate_is_plain_sum():
    # FusionModule's Softmax(dim=-1) over a singleton axis == weights of 1.0.
    rng = np.random.RandomState(4)
    x = rng.randn(2, 7, 5).astype(np.float32)
    p = layers.attn_pool_init(jax.random.PRNGKey(1), 5)
    got = np.asarray(layers.attn_pool_apply(p, jnp.asarray(x), normalized=False))
    np.testing.assert_allclose(got, x.sum(axis=1), rtol=1e-5, atol=1e-5)


def test_conv2d_matches_torch_temporal_conv():
    torch.manual_seed(5)
    conv = torch.nn.Conv2d(4, 6, kernel_size=(9, 1), padding=(4, 0))
    x = np.random.RandomState(5).randn(2, 4, 20, 15).astype(np.float32)
    with torch.no_grad():
        want = conv(torch.from_numpy(x)).numpy()
    p = {"w": jnp.asarray(conv.weight.detach().numpy()),
         "b": jnp.asarray(conv.bias.detach().numpy())}
    got = layers.conv2d_apply(p, jnp.asarray(x), padding=((4, 4), (0, 0)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
