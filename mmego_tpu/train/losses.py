"""Training losses for the three cascade stages.

Definitions mirror the reference exactly:
  * stage 1 (Train_IMU.py:138-141):  geodesic(R, R_gt) in degrees (summed)
    + 100 * sum ||t - head_gt||.
  * stage 2 (Train_Upper.py:179):    L1 sum over upper joint positions.
  * stage 3 (Train_Lower.py:216-222): L1 sum over lower joint positions.

All losses accept an optional per-window weight vector so padded batch tails
contribute zero (the reference instead pays a recompile-free eager pass on
ragged final batches; we keep static shapes for XLA).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from mmego_tpu.ops import rotation


def _weight(x: jnp.ndarray, w: Optional[jnp.ndarray], batch_ndim: int = 1):
    if w is None:
        return x
    return x * w.reshape(w.shape + (1,) * (x.ndim - batch_ndim))


def imu_loss(r: jnp.ndarray, t: jnp.ndarray, r_gt: jnp.ndarray,
             head_gt: jnp.ndarray, weights: Optional[jnp.ndarray] = None
             ) -> jnp.ndarray:
    ang = rotation.geodesic_angle(r, r_gt) / rotation._PI_REF * 180.0  # (B, L)
    pos = jnp.sqrt(jnp.sum(jnp.square(t - head_gt), axis=-1))         # (B, L)
    return jnp.sum(_weight(ang, weights)) + 100.0 * jnp.sum(_weight(pos, weights))


def l1_sum(pred: jnp.ndarray, target: jnp.ndarray,
           weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    return jnp.sum(_weight(jnp.abs(pred - target), weights))
