"""Pallas kernels vs their jnp fallbacks (interpreter mode on CPU; the same
code compiles to Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from mmego_tpu.ops import pallas_kernels as pk


def test_gcn_contract_matches_einsum():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 2, 32, 20, 15).astype(np.float32))
    a = jnp.asarray(rng.randn(2, 15, 15).astype(np.float32))
    want = pk.gcn_contract(x, a, use_pallas=False)
    with pltpu.force_tpu_interpret_mode():
        got = pk.gcn_contract(x, a, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n,c", [(128, 64), (27, 31)])
def test_attn_pool_matches_fallback(n, c):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(6, n, c).astype(np.float32))
    w = jnp.asarray(rng.randn(c, 1).astype(np.float32))
    b = jnp.asarray(rng.randn(1).astype(np.float32))
    want = pk.attn_pool(x, w, b, use_pallas=False)
    with pltpu.force_tpu_interpret_mode():
        got = pk.attn_pool(x, w, b, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_attn_pool_batch_dims():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 3, 16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(8, 1).astype(np.float32))
    b = jnp.zeros((1,), jnp.float32)
    want = pk.attn_pool(x, w, b, use_pallas=False)
    with pltpu.force_tpu_interpret_mode():
        got = pk.attn_pool(x, w, b, use_pallas=True)
    assert got.shape == (2, 3, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("b,n,m,c", [(33, 64, 15, 64), (7, 8, 5, 16)])
def test_cross_attn_colsum_matches_fallback(b, n, m, c):
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    k = jnp.asarray(rng.randn(b, m, c).astype(np.float32))
    v = jnp.asarray(rng.randn(b, m, c).astype(np.float32))
    scale = c ** -0.5
    want = pk.cross_attn_colsum(q, k, v, scale, use_pallas=False)
    with pltpu.force_tpu_interpret_mode():
        got = pk.cross_attn_colsum(q, k, v, scale, use_pallas=True)
    assert got.shape == (b, c)
    # the kernel computes scores in bf16: operands round to ~3 decimal digits
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_cross_attn_colsum_grad_matches_fallback():
    import jax
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(5, 8, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(5, 6, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(5, 6, 16).astype(np.float32))
    scale = 0.25
    f_ref = lambda q, k, v: jnp.sum(
        pk.cross_attn_colsum(q, k, v, scale, use_pallas=False) ** 2)
    f_ker = lambda q, k, v: jnp.sum(
        pk.cross_attn_colsum(q, k, v, scale, use_pallas=True) ** 2)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_ker = jax.grad(f_ker, argnums=(0, 1, 2))(q, k, v)
    # kernel forward rounds scores to bf16; the cotangent (2*out) inherits
    # that wobble, so the comparison is bf16-grade, not f32-grade
    for a, bb in zip(g_ker, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=6e-2, atol=6e-2)
