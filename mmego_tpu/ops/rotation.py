"""Rotation representations and metrics (pure jnp, fully batched).

TPU-native reformulation of the reference's rot6d helpers
(``Net/IMU_Net.py:7-47``), the geodesic loss (``Processor/Train/Train_IMU.py:21-34``),
the rotation-matrix angle metric (``Util/Universal_Util/Utils.py:263-271``) and
the bone-angle metric (``Processor/Test/Demo_test.py:64-69``).  All functions
accept arbitrary leading batch dimensions and contain no Python-level loops,
so they trace to a handful of fused VPU ops under ``jit``.
"""

from __future__ import annotations

import jax.numpy as jnp

_PI_REF = 3.14159265358  # the truncated pi constant used throughout the reference


def normalize(v: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Safe L2 normalisation over the last axis.

    Matches ``normalize_vector`` (IMU_Net.py:7-18): divides by
    ``max(|v|, eps)``.  ``torch.nn.functional.normalize`` (used by the MLP
    heads, eps 1e-12) is the same formula with a smaller eps.
    """
    mag = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / jnp.maximum(mag, eps)


def rot6d_to_matrix(poses: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Gram-Schmidt 6-D rotation representation -> SO(3) (Zhou et al.).

    Parity target: ``compute_rotation_matrix_from_ortho6d``
    (IMU_Net.py:34-47) and the inline variants in the MLP heads
    (Upper_Net.py:355-362, Lower_Net.py:126-133) -- identical math, the heads
    merely use torch's F.normalize eps.

    Args:
      poses: (..., 6) raw 6-D rotation representation.
    Returns:
      (..., 3, 3) rotation matrices whose *columns* are the x/y/z axes,
      matching the reference's ``torch.cat((x, y, z), 2)``.
    """
    x_raw = poses[..., 0:3]
    y_raw = poses[..., 3:6]
    x = normalize(x_raw, eps)
    z = normalize(jnp.cross(x, y_raw), eps)
    y = jnp.cross(z, x)
    return jnp.stack((x, y, z), axis=-1)


def geodesic_angle(m1: jnp.ndarray, m2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Geodesic angle (radians) between rotation matrices.

    Parity target: ``GeodesicLoss`` (Train_IMU.py:21-34) without the sum
    reduction; clamps cos into (-1+eps, 1-eps) exactly as the reference does.

    Args:
      m1, m2: (..., 3, 3).
    Returns:
      (...,) angles in radians.
    """
    m = jnp.matmul(m1, jnp.swapaxes(m2, -1, -2))
    trace = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    cos = (trace - 1.0) * 0.5
    return jnp.arccos(jnp.clip(cos, -1.0 + eps, 1.0 - eps))


def geodesic_loss_deg_sum(m1: jnp.ndarray, m2: jnp.ndarray) -> jnp.ndarray:
    """Summed geodesic angle in degrees: the reference stage-1 rotation loss
    ``loss_geodesic(R, R_gt) / pi * 180`` (Train_IMU.py:138)."""
    return jnp.sum(geodesic_angle(m1, m2)) / _PI_REF * 180.0


def angle_minus_deg(m1: jnp.ndarray, m2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Per-pair geodesic angle in degrees (Utils.py:263-271)."""
    return geodesic_angle(m1, m2, eps) / _PI_REF * 180.0


def bone_angle_error_deg(pred_vec: jnp.ndarray, true_vec: jnp.ndarray) -> jnp.ndarray:
    """Absolute angle (degrees) between predicted and true bone vectors.

    Parity target: ``angle_loss`` (Demo_test.py:64-69): cosine similarity with
    torch's eps=1e-8 denominator clamp, arccos clipped to [-1, 1].

    Args:
      pred_vec, true_vec: (..., 3) bone direction vectors.
    Returns:
      (...,) angles in degrees.
    """
    eps = 1e-8
    dot = jnp.sum(pred_vec * true_vec, axis=-1)
    n1 = jnp.linalg.norm(pred_vec, axis=-1)
    n2 = jnp.linalg.norm(true_vec, axis=-1)
    cos = dot / (jnp.maximum(n1, eps) * jnp.maximum(n2, eps))
    return jnp.abs(jnp.arccos(jnp.clip(cos, -1.0, 1.0)) / _PI_REF * 180.0)


def euler_to_matrix(theta, degrees: bool = True) -> jnp.ndarray:
    """ZYX fixed-axis Euler angles -> rotation matrix (Utils.py:326-351)."""
    t = jnp.asarray(theta, dtype=jnp.float32)
    if degrees:
        t = t * (jnp.pi / 180.0)
    cx, cy, cz = jnp.cos(t[..., 0]), jnp.cos(t[..., 1]), jnp.cos(t[..., 2])
    sx, sy, sz = jnp.sin(t[..., 0]), jnp.sin(t[..., 1]), jnp.sin(t[..., 2])
    r00 = cz * cy
    r01 = cz * sy * sx - sz * cx
    r02 = cz * sy * cx + sz * sx
    r10 = sz * cy
    r11 = sz * sy * sx + cz * cx
    r12 = sz * sy * cx - cz * sx
    r20 = -sy
    r21 = cy * sx
    r22 = cy * cx
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_euler(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> ZYX Euler angles in radians (Utils.py:307-323)."""
    sy = jnp.sqrt(r[..., 0, 0] ** 2 + r[..., 1, 0] ** 2)
    singular = sy < 1e-6
    x = jnp.where(singular,
                  jnp.arctan2(-r[..., 1, 2], r[..., 1, 1]),
                  jnp.arctan2(r[..., 2, 1], r[..., 2, 2]))
    y = jnp.arctan2(-r[..., 2, 0], sy)
    z = jnp.where(singular, 0.0, jnp.arctan2(r[..., 1, 0], r[..., 0, 0]))
    return jnp.stack([x, y, z], axis=-1)


def is_rotation_matrix(r: jnp.ndarray, tol: float = 1e-6) -> jnp.ndarray:
    """Frobenius check |R^T R - I| < tol (Utils.py:296-301)."""
    rtr = jnp.matmul(jnp.swapaxes(r, -1, -2), r)
    eye = jnp.eye(3, dtype=r.dtype)
    return jnp.linalg.norm(rtr - eye, axis=(-2, -1)) < tol
