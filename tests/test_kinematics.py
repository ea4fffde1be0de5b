"""FK parity: the parallel path-sum implementation vs an independent
sequential numpy oracle that walks the bone edges exactly like the reference
loops (Upper_Net.py:138-143, Lower_Net.py:30-35)."""

import numpy as np
import jax.numpy as jnp

from mmego_tpu.config import (
    SKELETON_UPPER, SKELETON_LOWER, UPPER_JOINT_MAP, LOWER_JOINT_MAP)
from mmego_tpu.ops import rotation, kinematics


def _rand_rots(rng, *shape):
    return np.asarray(rotation.rot6d_to_matrix(
        jnp.asarray(rng.randn(*shape, 6).astype(np.float32))))


def _seq_fk_upper(q, bones, head):
    """Sequential oracle: seed head at local idx 14, walk the 14 edges."""
    n = q.shape[0]
    l = np.zeros((n, 15, 3), dtype=np.float32)
    l[:, 14] = head
    jm = list(UPPER_JOINT_MAP)
    for i, (parent, child) in enumerate(SKELETON_UPPER):
        l[:, jm.index(child)] = l[:, jm.index(parent)] + np.einsum(
            "nij,nj->ni", q[:, jm.index(child)], bones[:, i])
    return l


def _seq_fk_lower(q, bones, hip_l, hip_r):
    n = q.shape[0]
    l = np.zeros((n, 8, 3), dtype=np.float32)
    l[:, 0] = hip_l
    l[:, 4] = hip_r
    jm = list(LOWER_JOINT_MAP)
    qorder = [13, 14, 15, 17, 18, 19]
    for i, (parent, child) in enumerate(SKELETON_LOWER):
        l[:, jm.index(child)] = l[:, jm.index(parent)] + np.einsum(
            "nij,nj->ni", q[:, qorder.index(child)], bones[:, 14 + i])
    return l


def test_fk_upper_matches_sequential():
    rng = np.random.RandomState(0)
    n = 12
    q = _rand_rots(rng, n, 14)
    bones = rng.randn(n, 20, 3).astype(np.float32) * 0.3
    head = rng.randn(n, 3).astype(np.float32)
    got = np.asarray(kinematics.fk_upper(
        jnp.asarray(q), jnp.asarray(bones), jnp.asarray(head)))
    np.testing.assert_allclose(got, _seq_fk_upper(q, bones, head), rtol=1e-5, atol=1e-5)


def test_fk_lower_matches_sequential():
    rng = np.random.RandomState(1)
    n = 9
    q = _rand_rots(rng, n, 6)
    bones = rng.randn(n, 20, 3).astype(np.float32) * 0.3
    hip_l = rng.randn(n, 3).astype(np.float32)
    hip_r = rng.randn(n, 3).astype(np.float32)
    got = np.asarray(kinematics.fk_lower(
        jnp.asarray(q), jnp.asarray(bones), jnp.asarray(hip_l), jnp.asarray(hip_r)))
    np.testing.assert_allclose(
        got, _seq_fk_lower(q, bones, hip_l, hip_r), rtol=1e-5, atol=1e-5)


def test_fk_upper_batched_leading_dims():
    rng = np.random.RandomState(2)
    q = jnp.asarray(_rand_rots(rng, 2, 5, 14))
    bones = jnp.asarray(rng.randn(2, 5, 20, 3).astype(np.float32))
    head = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))
    out = kinematics.fk_upper(q, bones, head)
    assert out.shape == (2, 5, 15, 3)


def test_fk_upper_identity_rotations_reconstruct_chain():
    # With identity rotations, child = parent + bone for every edge.
    q = jnp.broadcast_to(jnp.eye(3), (1, 14, 3, 3))
    rng = np.random.RandomState(3)
    bones = rng.randn(1, 20, 3).astype(np.float32)
    head = np.zeros((1, 3), np.float32)
    l = np.asarray(kinematics.fk_upper(q, jnp.asarray(bones), jnp.asarray(head)))
    jm = list(UPPER_JOINT_MAP)
    for i, (parent, child) in enumerate(SKELETON_UPPER):
        np.testing.assert_allclose(
            l[0, jm.index(child)], l[0, jm.index(parent)] + bones[0, i],
            rtol=1e-5, atol=1e-6)
