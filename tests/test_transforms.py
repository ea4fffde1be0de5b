import numpy as np
import jax.numpy as jnp

from mmego_tpu.ops import rotation, transforms


def _random_rt(rng, *batch):
    poses = rng.randn(*batch, 6).astype(np.float32)
    r = np.asarray(rotation.rot6d_to_matrix(jnp.asarray(poses)))
    t = rng.randn(*batch, 3).astype(np.float32)
    return jnp.asarray(r), jnp.asarray(t)


def test_to_head_rotates_only_xyz():
    rng = np.random.RandomState(0)
    pts = rng.randn(2, 5, 10, 6).astype(np.float32)
    r, t = _random_rt(rng, 2, 5)
    out = np.asarray(transforms.to_head(jnp.asarray(pts), r, t))
    # trailing features untouched
    np.testing.assert_array_equal(out[..., 3:], pts[..., 3:])
    # xyz = R @ (p - t), checked element-wise against a loop
    r_np, t_np = np.asarray(r), np.asarray(t)
    for b in range(2):
        for l in range(5):
            expect = (r_np[b, l] @ (pts[b, l, :, :3] - t_np[b, l]).T).T
            np.testing.assert_allclose(out[b, l, :, :3], expect, rtol=1e-5, atol=1e-5)


def test_roundtrip_identity():
    rng = np.random.RandomState(1)
    pts = rng.randn(3, 4, 7, 3).astype(np.float32)
    r, t = _random_rt(rng, 3, 4)
    fwd = transforms.to_head(jnp.asarray(pts), r, t)
    back = np.asarray(transforms.to_ref(fwd, r, t))
    np.testing.assert_allclose(back, pts, rtol=1e-4, atol=1e-5)


def test_imu_unused_gate():
    rng = np.random.RandomState(2)
    pts = jnp.asarray(rng.randn(2, 3, 4, 6).astype(np.float32))
    r, t = _random_rt(rng, 2, 3)
    np.testing.assert_array_equal(
        np.asarray(transforms.to_head(pts, r, t, imu_used=False)), np.asarray(pts))
    np.testing.assert_array_equal(
        np.asarray(transforms.to_ref(pts[..., :3], r, t, imu_used=False)),
        np.asarray(pts[..., :3]))


def test_pure_xyz_input():
    rng = np.random.RandomState(3)
    pts = rng.randn(2, 2, 6, 3).astype(np.float32)
    r, t = _random_rt(rng, 2, 2)
    out = transforms.to_head(jnp.asarray(pts), r, t)
    assert out.shape == (2, 2, 6, 3)
