import os
import tempfile

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmego_tpu.models import cascade
from mmego_tpu.checkpoint import store


def _toy_inputs(rng, b=2, l=20):
    return (jnp.asarray(rng.randn(b, l, 128, 6).astype(np.float32)),
            jnp.asarray(rng.randn(b, l, 20, 15).astype(np.float32)),
            jnp.asarray(np.tile(rng.randn(1, 20, 3).astype(np.float32) * 0.2,
                                (b, 1, 1))))


def _small_cascade(key):
    """Full cascade pytree with a shrunk IMU stage: generating/serialising
    the production 23M-param IMU net dominated these tests' wall time and
    adds nothing to what they assert."""
    import unittest.mock as mock
    from mmego_tpu.models import imu_net
    orig = imu_net.imu_net_init
    with mock.patch.object(cascade.imu_net, "imu_net_init",
                           lambda rng: orig(rng, hidden=32)):
        return cascade.cascade_init(key)


def test_cascade_shapes_and_jit():
    params, state = _small_cascade(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    cloud, imu, bones = _toy_inputs(rng)
    # params as ARGUMENTS, as in production (a closure would embed the
    # weights as HLO constants -- the documented slow-compile antipattern)
    fn = jax.jit(cascade.cascade_apply)
    out = fn(params, state, cloud, imu, bones)
    assert out["r"].shape == (2, 20, 3, 3)
    assert out["upper"].shape == (2, 20, 15, 3)
    assert out["lower"].shape == (2, 20, 8, 3)
    assert out["all"].shape == (2, 20, 21, 3)
    assert np.isfinite(np.asarray(out["all"])).all()


def test_assemble_skeleton_lower_overwrites_hips():
    upper = jnp.ones((1, 2, 15, 3))
    lower = jnp.full((1, 2, 8, 3), 2.0)
    out = np.asarray(cascade.assemble_skeleton(upper, lower))
    # joints 12 and 16 are predicted by both stages; lower wins
    assert (out[..., 12, :] == 2.0).all()
    assert (out[..., 16, :] == 2.0).all()
    assert (out[..., 0, :] == 1.0).all()
    assert (out[..., 13, :] == 2.0).all()


def test_store_roundtrip_cascade_params():
    params, state = _small_cascade(jax.random.PRNGKey(1))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ck.npz")
        store.save(path, params)
        loaded = store.load(path, params)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_roundtrip():
    pytest.importorskip("orbax.checkpoint")
    params, _ = _small_cascade(jax.random.PRNGKey(2))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ck")
        store.save_orbax(path, params.upper)
        loaded = store.load_orbax(path, params.upper)
        for a, b in zip(jax.tree.leaves(params.upper), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_epoch_path_and_latest():
    with tempfile.TemporaryDirectory() as d:
        p1 = store.epoch_path(d, 1001, 49, 20, 20, 3e-5)
        p2 = store.epoch_path(d, 1001, 99, 20, 20, 3e-5)
        store.save(p1, {"x": jnp.zeros(3)})
        store.save(p2, {"x": jnp.ones(3)})
        # BN-state sidecars share the epoch prefix; latest_epoch must never
        # return one (os.listdir order is arbitrary, so without the filter
        # this failed nondeterministically across filesystems).
        store.save(os.path.splitext(p2)[0] + ".state.npz", {"m": jnp.zeros(2)})
        assert store.latest_epoch(os.path.dirname(p1)) == p2
