"""Evaluation metrics -- exact reproductions of the reference definitions.

Joint localization error: mean Euclidean distance, reported in cm via x100
(``Demo_test.py:150-158, 176-180``).  Rotation error: per-bone absolute angle
between predicted and true bone vectors, degrees (``Demo_test.py:64-69``).
The reference accumulates per-window (batch=1) means and averages over
windows; with every window contributing identical element counts this equals
the flat mean computed here.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from mmego_tpu.config import (
    SKELETON_ALL, UPPER_JOINT_MAP, LOWER_JOINT_MAP, HAND_JOINT_MAP,
    skeleton_all_np)
from mmego_tpu.ops import rotation


def joint_error(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance per joint: (..., J, 3) -> (..., J)."""
    return jnp.sqrt(jnp.sum(jnp.square(pred - target), axis=-1))


def bone_vectors(joints: jnp.ndarray) -> jnp.ndarray:
    """(..., 21, 3) -> (..., 20, 3) child-minus-parent bone vectors over
    SKELETON_ALL (the ``leaf - root`` convention of Demo_test.py:65-66)."""
    edges = skeleton_all_np()
    return (joints[..., edges[:, 1], :] - joints[..., edges[:, 0], :])


def metric_sums(pred_all: jnp.ndarray, target_all: jnp.ndarray,
                upper_pred: jnp.ndarray, lower_pred: jnp.ndarray,
                weights: jnp.ndarray = None) -> dict:
    """Device-side metric accumulation for one batch: per-joint/bone error
    SUMS over (W, L) plus element counts.  Keeps the eval loop free of bulk
    D2H transfers -- only these tiny vectors leave the chip; the host divides
    at the end.  jit-safe (all shapes static); ``weights`` (W,) zeroes padded
    windows."""
    target_upper = target_all[..., jnp.asarray(UPPER_JOINT_MAP), :]
    target_lower = target_all[..., jnp.asarray(LOWER_JOINT_MAP), :]
    err_all = joint_error(pred_all, target_all)            # (W, L, 21)
    err_upper = joint_error(upper_pred, target_upper)
    err_lower = joint_error(lower_pred, target_lower)
    angles = rotation.bone_angle_error_deg(
        bone_vectors(pred_all), bone_vectors(target_all))  # (W, L, 20)
    if weights is None:
        weights = jnp.ones(err_all.shape[0], err_all.dtype)
    w3 = weights[:, None, None]
    n = jnp.sum(weights) * err_all.shape[1]
    return {
        "joint_sum": jnp.sum(err_all * w3, axis=(0, 1)),   # (21,)
        "upper_sum": jnp.sum(err_upper * w3),
        "lower_sum": jnp.sum(err_lower * w3),
        "bone_sum": jnp.sum(angles * w3, axis=(0, 1)),     # (20,)
        "count": n,
    }


# Flat layout of one metric_sums dict: joint_sum (21) | bone_sum (20) |
# upper_sum | lower_sum | count.  A single packed vector lets eval loops
# accumulate on device and fetch once (one tunnel round trip total).
PACKED_LEN = 21 + 20 + 3


def pack_metric_sums(s: dict) -> jnp.ndarray:
    return jnp.concatenate([
        s["joint_sum"], s["bone_sum"],
        jnp.stack([s["upper_sum"], s["lower_sum"], s["count"]])])


def unpack_metric_sums(v) -> dict:
    return {"joint_sum": v[:21], "bone_sum": v[21:41],
            "upper_sum": v[41], "lower_sum": v[42], "count": v[43]}


def finalize_metric_sums(sums_list) -> Dict[str, np.ndarray]:
    """Combine per-batch metric_sums into the reference metric block."""
    total = {k: sum(np.asarray(s[k], dtype=np.float64) for s in sums_list)
             for k in sums_list[0]}
    n = total["count"]
    per_joint_cm = total["joint_sum"] / n * 100.0
    per_bone_deg = total["bone_sum"] / n
    return {
        "avg_cm": float(per_joint_cm.mean()),
        "upper_cm": float(total["upper_sum"] / (n * len(UPPER_JOINT_MAP))) * 100.0,
        "lower_cm": float(total["lower_sum"] / (n * len(LOWER_JOINT_MAP))) * 100.0,
        "rot_deg": float(per_bone_deg.mean()),
        "per_joint_cm": per_joint_cm,
        "per_bone_deg": per_bone_deg,
        "hand_cm": per_joint_cm[list(HAND_JOINT_MAP)],
    }


def pose_metrics(pred_all: jnp.ndarray, target_all: jnp.ndarray,
                 upper_pred: jnp.ndarray, lower_pred: jnp.ndarray
                 ) -> Dict[str, np.ndarray]:
    """The --infer metric block (Demo_test.py:141-180).

    Args:
      pred_all/target_all: (W, L, 21, 3); upper_pred: (W, L, 15, 3) stage-2
      output; lower_pred: (W, L, 8, 3) stage-3 output.
    Returns:
      dict of numpy scalars/vectors; distances in cm, angles in degrees.
    """
    target_upper = target_all[..., jnp.asarray(UPPER_JOINT_MAP), :]
    target_lower = target_all[..., jnp.asarray(LOWER_JOINT_MAP), :]

    err_all = joint_error(pred_all, target_all)          # (W, L, 21)
    err_upper = joint_error(upper_pred, target_upper)
    err_lower = joint_error(lower_pred, target_lower)

    angles = rotation.bone_angle_error_deg(
        bone_vectors(pred_all), bone_vectors(target_all))  # (W, L, 20)

    per_joint_cm = np.asarray(jnp.mean(err_all, axis=(0, 1))) * 100.0
    per_bone_deg = np.asarray(jnp.mean(angles, axis=(0, 1)))
    return {
        "avg_cm": float(jnp.mean(err_all)) * 100.0,
        "upper_cm": float(jnp.mean(err_upper)) * 100.0,
        "lower_cm": float(jnp.mean(err_lower)) * 100.0,
        "rot_deg": float(per_bone_deg.mean()),
        "per_joint_cm": per_joint_cm,
        "per_bone_deg": per_bone_deg,
        # wrist/elbow errors (Train_Upper.py:118 prints accu_ll[hand_joint_map])
        "hand_cm": per_joint_cm[list(HAND_JOINT_MAP)],
    }


def format_report(m: Dict[str, np.ndarray]) -> str:
    """The README-format output block (Demo_test.py:176-180)."""
    return "\n".join([
        f"Average Joint Localization Error(cm): {m['avg_cm']}",
        f"Average UpperBody Joint Localization Error(cm): {m['upper_cm']}",
        f"Average LowerBody Joint Localization Error(cm): {m['lower_cm']}",
        f"Average Joint Rotation Error(°): {m['rot_deg']}",
        f"Per Joint Localization Error(cm): {m['per_joint_cm'].tolist()}",
    ])
