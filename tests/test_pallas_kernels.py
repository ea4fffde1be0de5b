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
