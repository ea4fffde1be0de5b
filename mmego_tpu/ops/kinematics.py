"""Forward kinematics over the fixed mmEgo skeletons -- fully parallel.

The reference runs FK as a sequential in-place Python loop over bone edges
(``Net/Upper_Net.py:122-144`` for the 14 upper edges seeded at the head joint,
``Net/Lower_Net.py:12-37`` for the 6 lower edges seeded at both hips).  Because
every per-edge rotation is indexed by the edge's *child* joint and applied to a
fixed bone vector, joint positions decompose into independent path sums:

    l[j] = seed(j) + sum_{e on path(root -> j)} q[child(e)] @ bone[e]

which turns the 14-step (resp. 6-step) serial chain into two batched einsums --
one to rotate all bones at once, one (a tiny matmul against a constant 0/1
path matrix) to prefix-sum them.  No scan, no dynamic indexing; XLA maps both
onto the MXU and the whole FK costs ~nothing.

Bone-vector layout: ``bones`` is the full 20-edge ``initial_body`` array in
``SKELETON_ALL`` edge order; upper FK consumes bones[..., :14, :], lower FK
bones[..., 14:, :] (reference Lower_Net.py:35 uses ``body[:, i + 14]``).

NOTE the reference tiles ``initial_body`` over the frame axis with
``.repeat(L, 1, 1, 1)`` (Upper_Net.py:134), which mis-pairs batch elements
with bone sets whenever B > 1 *and* bone sets differ across the batch.  In
the released data the calibration runs once globally so every window carries
identical bones and the bug is unobservable; we implement the correct
per-batch-element pairing.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mmego_tpu.config import (
    SKELETON_UPPER,
    SKELETON_LOWER,
    UPPER_JOINT_MAP,
    LOWER_JOINT_MAP,
)


def _build_paths(edges, roots, joint_order):
    """Path-membership matrix P[j, e] = 1 iff edge e lies on root->joint j."""
    paths = {r: [] for r in roots}
    for e, (parent, child) in enumerate(edges):
        paths[child] = paths[parent] + [e]
    p = np.zeros((len(joint_order), len(edges)), dtype=np.float32)
    for j, joint in enumerate(joint_order):
        for e in paths[joint]:
            p[j, e] = 1.0
    return p


# ---- Upper body: 15 joints, head (global id 20, local idx 14) is the seed.
_UPPER_PATHS = _build_paths(SKELETON_UPPER, roots=(20,), joint_order=UPPER_JOINT_MAP)
# Rotation index per edge: q is indexed by the child joint's local index
# (Upper_Net.py:141-142 uses ``q[:, upper_joint_map.index(child)]``).
_UPPER_CIDX = np.asarray([UPPER_JOINT_MAP.index(c) for _, c in SKELETON_UPPER], dtype=np.int32)

# ---- Lower body: 8 joints; joints 12 (idx 0) and 16 (idx 4) are the seeds.
_LOWER_PATHS = _build_paths(SKELETON_LOWER, roots=(12, 16), joint_order=LOWER_JOINT_MAP)
# q (6 rotations) is indexed by ``[13,14,15,17,18,19].index(child)``
# (Lower_Net.py:29,35).
_LOWER_Q_ORDER = (13, 14, 15, 17, 18, 19)
_LOWER_CIDX = np.asarray([_LOWER_Q_ORDER.index(c) for _, c in SKELETON_LOWER], dtype=np.int32)
# Seed-selection: joints 12..15 hang off the left hip, 16..19 off the right.
_LOWER_SEED = np.zeros((8, 2), dtype=np.float32)
for _j, _joint in enumerate(LOWER_JOINT_MAP):
    _LOWER_SEED[_j, 0 if _joint < 16 else 1] = 1.0


def fk_upper(q: jnp.ndarray, bones: jnp.ndarray, head: jnp.ndarray) -> jnp.ndarray:
    """Upper-body forward kinematics.

    Args:
      q: (..., 14, 3, 3) per-joint rotations (indexed by child joint).
      bones: (..., 20, 3) full bone-vector table (upper edges = first 14).
             Leading dims must broadcast against q's.
      head: (..., 3) head-joint position (the FK seed).
    Returns:
      (..., 15, 3) joint positions in UPPER_JOINT_MAP order.
    """
    cidx = jnp.asarray(_UPPER_CIDX)
    p = jnp.asarray(_UPPER_PATHS)
    q_e = jnp.take(q, cidx, axis=-3)                    # (..., 14, 3, 3)
    contrib = jnp.einsum("...eij,...ej->...ei", q_e, bones[..., :14, :], precision="highest")
    return head[..., None, :] + jnp.einsum("je,...ei->...ji", p, contrib, precision="highest")


def fk_lower(q: jnp.ndarray, bones: jnp.ndarray,
             hip_left: jnp.ndarray, hip_right: jnp.ndarray) -> jnp.ndarray:
    """Lower-body forward kinematics.

    Args:
      q: (..., 6, 3, 3) rotations in (13,14,15,17,18,19) child order.
      bones: (..., 20, 3) full bone table (lower edges = last 6).
      hip_left, hip_right: (..., 3) the two FK seeds (joints 12 and 16).
    Returns:
      (..., 8, 3) joint positions in LOWER_JOINT_MAP order.
    """
    cidx = jnp.asarray(_LOWER_CIDX)
    p = jnp.asarray(_LOWER_PATHS)
    s = jnp.asarray(_LOWER_SEED)
    q_e = jnp.take(q, cidx, axis=-3)                    # (..., 6, 3, 3)
    contrib = jnp.einsum("...eij,...ej->...ei", q_e, bones[..., 14:, :], precision="highest")
    seeds = jnp.stack([hip_left, hip_right], axis=-2)   # (..., 2, 3)
    base = jnp.einsum("js,...si->...ji", s, seeds, precision="highest")      # (..., 8, 3)
    return base + jnp.einsum("je,...ei->...ji", p, contrib, precision="highest")
