"""World <-> head-frame point transforms.

Functional reformulation of ``Transform2H`` / ``Transform2R``
(``Util/Universal_Util/Utils.py:274-292``).  The reference versions operate in
place on (B*L, N, F) tensors with repeated R/t; here they are pure functions
over (..., N, F) with broadcasting -- XLA fuses the subtract/matmul/concat into
one pass over the cloud.

Semantics preserved exactly:
  * ``to_head`` rotates only the first three features (xyz), leaving
    range/velocity/intensity untouched: ``x[:3] <- R @ (x[:3] - t)``.
  * ``to_ref`` applies the inverse to *all* features (the reference only ever
    calls it on pure-xyz joint arrays): ``x <- R^T @ x + t``.
  * Both are identity when ``imu_used`` is False (Config.IMU_used gate).

NOTE the reference's in-place mutation means callers observe their input
mutated; the cascade wiring in models/cascade.py reproduces that dataflow
explicitly (the lower stage receives an already-transformed cloud and
transforms it a second time).
"""

from __future__ import annotations

import jax.numpy as jnp


def to_head(points: jnp.ndarray, r: jnp.ndarray, t: jnp.ndarray,
            imu_used: bool = True) -> jnp.ndarray:
    """Transform points into the head frame.

    Args:
      points: (..., N, F) with F >= 3; xyz in the leading three features.
      r: (..., 3, 3) head rotation per frame.
      t: (..., 3) head position per frame.
    Returns:
      (..., N, F) with xyz replaced by R @ (xyz - t); trailing features copied.
    """
    if not imu_used:
        return points
    xyz = points[..., :3]
    shifted = xyz - t[..., None, :]
    # (..., N, 3) @ (..., 3, 3)^T contracted on the right == R @ v per point.
    rotated = jnp.einsum("...ij,...nj->...ni", r, shifted, precision="highest")
    if points.shape[-1] == 3:
        return rotated
    return jnp.concatenate([rotated, points[..., 3:]], axis=-1)


def to_ref(points: jnp.ndarray, r: jnp.ndarray, t: jnp.ndarray,
           imu_used: bool = True) -> jnp.ndarray:
    """Inverse transform back to the reference frame: R^T @ p + t.

    Args:
      points: (..., N, 3).
      r: (..., 3, 3); t: (..., 3).
    """
    if not imu_used:
        return points
    rotated = jnp.einsum("...ji,...nj->...ni", r, points, precision="highest")
    return rotated + t[..., None, :]
