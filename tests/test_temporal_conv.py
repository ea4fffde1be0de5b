"""Parity of the banded-matmul temporal conv vs the reference conv lowering."""

import numpy as np
import jax
import jax.numpy as jnp

from mmego_tpu.nn import layers
from mmego_tpu.ops import temporal_conv


def _conv_ref(p, x, k=9):
    pad = k // 2
    return layers.conv2d_apply(p, x, padding=((pad, pad), (0, 0)))


def test_matches_conv_lowering():
    rng = jax.random.PRNGKey(0)
    for n, c, o, t, v, k in [(4, 32, 32, 20, 15, 9),
                             (2, 64, 64, 20, 15, 9),
                             (3, 8, 16, 12, 7, 5),
                             (2, 5, 3, 9, 4, 9)]:
        rng, k1, k2 = jax.random.split(rng, 3)
        p = layers.conv2d_init(k1, c, o, k, 1)
        x = jax.random.normal(k2, (n, c, t, v), jnp.float32)
        want = np.asarray(_conv_ref(p, x, k))
        got = np.asarray(temporal_conv.temporal_conv_matmul(p, x))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_banded_weights_differentiable():
    p = layers.conv2d_init(jax.random.PRNGKey(1), 4, 4, 9, 1)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 20, 3), jnp.float32)

    def loss_m(w):
        return jnp.sum(temporal_conv.temporal_conv_matmul(
            {"w": w, "b": p["b"]}, x) ** 2)

    def loss_c(w):
        return jnp.sum(_conv_ref({"w": w, "b": p["b"]}, x) ** 2)

    gm = np.asarray(jax.grad(loss_m)(p["w"]))
    gc = np.asarray(jax.grad(loss_c)(p["w"]))
    np.testing.assert_allclose(gm, gc, rtol=1e-4, atol=1e-4)


def test_stgcn_block_switch_parity(monkeypatch):
    """The eval path with ONLY the 'tcn' switch on must match the conv path
    (per-op patch: a blanket override(True) would also route the gcn Pallas
    kernel, forcing slow interpret mode on CPU for an unrelated op)."""
    from mmego_tpu.models import stgcn
    from mmego_tpu.ops import pallas_ctl
    monkeypatch.setattr(pallas_ctl, "enabled", lambda op="lstm": op == "tcn")
    params, state = stgcn.stgcn_init(jax.random.PRNGKey(3))
    joints = jax.random.normal(jax.random.PRNGKey(4), (3, 20, 15, 3),
                               jnp.float32)
    alt, _ = stgcn.stgcn_apply(params, state, joints, train=False)
    monkeypatch.setattr(pallas_ctl, "enabled", lambda op="lstm": False)
    base, _ = stgcn.stgcn_apply(params, state, joints, train=False)
    np.testing.assert_allclose(np.asarray(alt), np.asarray(base),
                               rtol=2e-5, atol=2e-5)
