import os

import numpy as np

from mmego_tpu.config import Config
from mmego_tpu.viz import curves, pose3d


def _cfg(tmp_path):
    return Config(idx=5, report_root=str(tmp_path))


def test_draw_curves(tmp_path):
    cfg = _cfg(tmp_path)
    p1 = curves.draw_curve([3.0, 2.0, 1.5, 1.2], "loss", cfg)
    p2 = curves.draw_curve([0.1, 0.08, 0.06], "acc", cfg)
    assert os.path.exists(p1) and os.path.exists(p2)


def test_draw_bars(tmp_path):
    cfg = _cfg(tmp_path)
    assert os.path.exists(curves.draw_joint_bar(list(np.arange(21.0)), cfg))
    assert os.path.exists(curves.draw_bone_angle_bar(list(np.arange(20.0)), cfg))


def test_plot_confusion(tmp_path):
    cfg = _cfg(tmp_path)
    m = np.eye(13) * 10
    assert os.path.exists(curves.plot_confusion(m, cfg))


def test_action_gif_and_frame_dump(tmp_path):
    rng = np.random.RandomState(0)
    pose = rng.randn(3, 21, 3).astype(np.float32) * 0.3
    floor = np.full(3, 1.0)
    out = pose3d.action_gif(pose, pose, 0, floor, str(tmp_path / "svg"))
    assert out is not None and os.path.exists(out)
    pose3d.dump_pose_frames(pose[:1], pose[:1], 0, floor, str(tmp_path / "frames"))
    assert os.path.exists(tmp_path / "frames" / "0" / "pred_frame_0.svg")
