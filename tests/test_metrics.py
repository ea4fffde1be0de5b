import numpy as np
import jax.numpy as jnp

from mmego_tpu.train import metrics


def test_joint_error_zero_for_identical():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 21, 3).astype(np.float32))
    assert float(metrics.joint_error(x, x).max()) == 0.0


def test_pose_metrics_known_offset():
    rng = np.random.RandomState(1)
    target = rng.randn(4, 5, 21, 3).astype(np.float32)
    offset = np.zeros_like(target)
    offset[..., 0] = 0.01  # 1 cm in x everywhere
    pred = target + offset
    upper = pred[:, :, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 16, 20], :]
    lower = pred[:, :, 12:20, :]
    m = metrics.pose_metrics(jnp.asarray(pred), jnp.asarray(target),
                             jnp.asarray(upper), jnp.asarray(lower))
    assert abs(m["avg_cm"] - 1.0) < 1e-4
    assert abs(m["upper_cm"] - 1.0) < 1e-4
    assert abs(m["lower_cm"] - 1.0) < 1e-4
    assert m["per_joint_cm"].shape == (21,)
    # a constant offset leaves bone vectors unchanged -> zero rotation error
    assert m["rot_deg"] < 1e-2


def test_format_report_lines():
    m = {"avg_cm": 1.0, "upper_cm": 2.0, "lower_cm": 3.0, "rot_deg": 4.0,
         "per_joint_cm": np.zeros(21)}
    rep = metrics.format_report(m)
    assert "Average Joint Localization Error(cm): 1.0" in rep
    assert rep.count("\n") == 4


def test_bone_vectors_shape():
    x = jnp.zeros((2, 3, 21, 3))
    assert metrics.bone_vectors(x).shape == (2, 3, 20, 3)
