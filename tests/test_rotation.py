import numpy as np
import jax.numpy as jnp
import pytest

from mmego_tpu.ops import rotation


def _np_rot6d(poses, eps=1e-8):
    """Independent numpy oracle for the Gram-Schmidt 6d -> SO(3) map."""
    x_raw, y_raw = poses[..., :3], poses[..., 3:]
    x = x_raw / np.maximum(np.linalg.norm(x_raw, axis=-1, keepdims=True), eps)
    z = np.cross(x, y_raw)
    z = z / np.maximum(np.linalg.norm(z, axis=-1, keepdims=True), eps)
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=-1)


def test_rot6d_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    poses = rng.randn(64, 6).astype(np.float32)
    got = np.asarray(rotation.rot6d_to_matrix(jnp.asarray(poses)))
    np.testing.assert_allclose(got, _np_rot6d(poses), rtol=1e-5, atol=1e-5)


def test_rot6d_is_valid_rotation():
    rng = np.random.RandomState(1)
    poses = rng.randn(8, 5, 6).astype(np.float32)
    r = np.asarray(rotation.rot6d_to_matrix(jnp.asarray(poses)))
    eye = np.broadcast_to(np.eye(3), r.shape)
    np.testing.assert_allclose(np.matmul(np.swapaxes(r, -1, -2), r), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_rot6d_identity_from_canonical_basis():
    pose = jnp.asarray([[1.0, 0, 0, 0, 1.0, 0]])
    r = np.asarray(rotation.rot6d_to_matrix(pose))[0]
    np.testing.assert_allclose(r, np.eye(3), atol=1e-6)


def test_geodesic_angle_known_rotation():
    # 90 degrees about z.
    theta = np.pi / 2
    rz = np.array([[np.cos(theta), -np.sin(theta), 0],
                   [np.sin(theta), np.cos(theta), 0],
                   [0, 0, 1]], dtype=np.float32)
    ang = float(rotation.geodesic_angle(jnp.asarray(rz), jnp.eye(3)))
    assert abs(ang - theta) < 1e-5


def test_geodesic_angle_clamped_at_identity():
    # cos would be exactly 1 -> clamp keeps arccos finite and ~0.
    ang = float(rotation.geodesic_angle(jnp.eye(3), jnp.eye(3)))
    assert 0.0 <= ang < 1e-2


def test_angle_minus_degrees():
    theta = np.deg2rad(30.0)
    rz = np.array([[np.cos(theta), -np.sin(theta), 0],
                   [np.sin(theta), np.cos(theta), 0],
                   [0, 0, 1]], dtype=np.float32)
    deg = float(rotation.angle_minus_deg(jnp.asarray(rz), jnp.eye(3)))
    assert abs(deg - 30.0) < 1e-3


def test_bone_angle_error():
    v1 = jnp.asarray([[1.0, 0.0, 0.0]])
    v2 = jnp.asarray([[0.0, 1.0, 0.0]])
    assert abs(float(rotation.bone_angle_error_deg(v1, v2)[0]) - 90.0) < 1e-4
    assert float(rotation.bone_angle_error_deg(v1, v1)[0]) < 1e-2


def test_euler_roundtrip():
    rng = np.random.RandomState(2)
    angles = rng.uniform(-60, 60, size=(16, 3)).astype(np.float32)
    r = rotation.euler_to_matrix(jnp.asarray(angles), degrees=True)
    assert bool(jnp.all(rotation.is_rotation_matrix(r)))
    back = np.rad2deg(np.asarray(rotation.matrix_to_euler(r)))
    np.testing.assert_allclose(back, angles, atol=1e-3)


@pytest.mark.parametrize("shape", [(4, 6), (2, 3, 6), (5, 20, 14, 6)])
def test_rot6d_batch_shapes(shape):
    rng = np.random.RandomState(3)
    poses = rng.randn(*shape).astype(np.float32)
    r = rotation.rot6d_to_matrix(jnp.asarray(poses))
    assert r.shape == shape[:-1] + (3, 3)
