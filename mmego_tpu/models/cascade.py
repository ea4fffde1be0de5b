"""The fused three-stage cascade: IMU -> Upper -> Lower -> 21-joint skeleton.

The reference runs the cascade as three separate ``nn.Module`` calls per
window inside a Python loop with per-window host->device copies
(``Processor/Test/Demo_test.py:86-163``); its 29.5 it/s includes all of that
overhead.  Here the cascade is one pure function over a *batch* of windows,
jit-compiled once; the benchmark path pushes the whole 835-window test set
through in a few device batches.

Stage boundaries follow ``Processor/Train/Train_Lower.py:190-199`` (the
deepest training cascade): stage outputs are ``stop_gradient``-ed before
feeding downstream, matching the reference's ``.clone().detach()`` freeze.

Dataflow quirk reproduced exactly: the reference's in-place ``Transform2H``
means the lower stage receives the cloud already transformed to the head
frame by the upper stage and transforms it *again* (see upper_net.py notes).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mmego_tpu.config import UPPER_JOINT_MAP, LOWER_JOINT_MAP
from mmego_tpu.models import imu_net, upper_net, lower_net


class CascadeParams(NamedTuple):
    imu: dict
    upper: dict
    lower: dict


class CascadeState(NamedTuple):
    upper: dict
    lower: dict


def cascade_init(rng) -> Tuple[CascadeParams, CascadeState]:
    k1, k2, k3 = jax.random.split(rng, 3)
    up, us = upper_net.upper_net_init(k2)
    lp, ls = lower_net.lower_net_init(k3)
    return (CascadeParams(imu=imu_net.imu_net_init(k1), upper=up, lower=lp),
            CascadeState(upper=us, lower=ls))


def cascade_apply(params: CascadeParams, state: CascadeState,
                  cloud: jnp.ndarray, imu: jnp.ndarray, bones: jnp.ndarray,
                  lower_pc_no: int = 64, imu_used: bool = True
                  ) -> dict:
    """Full inference cascade (eval mode).

    Args:
      cloud: (B, L, 128, 6); imu: (B, L, 20, 15); bones: (B, 20, 3).
    Returns:
      dict with r, t, upper (B, L, 15, 3), lower (B, L, 8, 3), and the
      assembled 21-joint skeleton ``all`` (B, L, 21, 3).
    """
    r, t = imu_net.imu_net_apply(params.imu, imu)
    r = jax.lax.stop_gradient(r)
    t = jax.lax.stop_gradient(t)

    upper_l, _, cloud_h, _ = upper_net.upper_net_apply(
        params.upper, state.upper, cloud, bones, r, t, imu_used)
    upper_l = jax.lax.stop_gradient(upper_l)

    lower_l, lower_q, _ = lower_net.lower_net_apply(
        params.lower, state.lower, upper_l, cloud_h, bones, r, t,
        lower_pc_no, imu_used)

    return {
        "r": r, "t": t,
        "upper": upper_l, "lower": lower_l, "lower_q": lower_q,
        "all": assemble_skeleton(upper_l, lower_l),
    }


def assemble_skeleton(upper_l: jnp.ndarray, lower_l: jnp.ndarray) -> jnp.ndarray:
    """Union of the two stages into the 21-joint skeleton.

    Matches ``pred_l[:, :, upper_map] = upper; pred_l[:, :, lower_map] = lower``
    (Demo_test.py:121-123): the lower stage's hips overwrite the upper's.
    """
    b, l = upper_l.shape[:2]
    pred = jnp.zeros(upper_l.shape[:2] + (21, 3), upper_l.dtype)
    pred = pred.at[..., jnp.asarray(UPPER_JOINT_MAP), :].set(upper_l)
    pred = pred.at[..., jnp.asarray(LOWER_JOINT_MAP), :].set(lower_l)
    return pred
