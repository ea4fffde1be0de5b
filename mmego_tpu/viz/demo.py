"""The ``--infer --vis`` path: per-action skeleton animations.

Reproduces ``Demo_test.eval_all_skeleton`` (Demo_test.py:186-247): take
``batch_per_action`` windows per action, run the cascade, rotate predictions
and ground truth into the world frame with R_RtW, and render a pred-vs-real
animation per action batch.  Artifacts land under
``{report_root}/{idx}/svg/`` as GIFs (headless; ``--colab`` kept only for CLI
surface parity).
"""

from __future__ import annotations

import os

import numpy as np

from mmego_tpu.config import Config
from mmego_tpu.data import dataset as dataset_mod
from mmego_tpu import infer as infer_mod
from mmego_tpu.viz import pose3d


def render_frames(cfg: Config, data=None, params=None, state=None,
                  max_windows: int = 3) -> str:
    """Per-frame pred/real SVG dump (``Train_Lower.eval_all_skeleton``,
    Train_Lower.py:334-388): runs the cascade on the first windows of the vis
    split and writes one pred + one real SVG per frame under
    ``{report_root}/{idx}/svg/``."""
    if data is None:
        data = dataset_mod.load_split(cfg, "vis")
    data = data.take(slice(0, max_windows))
    if params is None:
        params, state = infer_mod.load_cascade_params(cfg)
    preds = infer_mod.run_cascade_batched(
        params, state, data, len(data), cfg.lower_pc_no, cfg.imu_used)
    b, l = len(data), cfg.frame_no
    pred = preds["all"].reshape(b * l, 21, 3)
    real = data.key.reshape(b * l, 21, 3)
    floor = data.ground.reshape(b * l, 4)[:, -1]
    out_root = os.path.join(cfg.report_root, str(cfg.idx), "svg")
    pose3d.dump_pose_frames(pred, real, 0, floor, out_root)
    print(f"wrote {b * l} frame SVG pairs to {out_root}")
    return out_root


def render_actions(cfg: Config, data=None, params=None, state=None) -> list:
    if data is None:
        data = dataset_mod.load_split(cfg, "action_vis")
    if params is None:
        params, state = infer_mod.load_cascade_params(cfg)

    batch = cfg.batch_per_action
    preds = infer_mod.run_cascade_batched(
        params, state, data, batch, cfg.lower_pc_no, cfg.imu_used)

    out_root = os.path.join(cfg.report_root, str(cfg.idx), "svg")
    outputs = []
    n = len(data)
    for batch_idx, start in enumerate(range(0, n, batch)):
        end = min(start + batch, n)
        b, l = end - start, cfg.frame_no
        pred = preds["all"][start:end].reshape(b * l, 21, 3)
        real = data.key[start:end].reshape(b * l, 21, 3)
        r_rtw = data.r_rtw[start:end].reshape(b * l, 3, 3)
        # world-frame rotation: row-vector matmul as in Demo_test.py:233-235
        pred = np.einsum("nij,njk->nik", pred, r_rtw)
        real = np.einsum("nij,njk->nik", real, r_rtw)
        floor = data.ground[start:end].reshape(b * l, 4)[:, -1]
        outputs.append(pose3d.action_gif(pred, real, batch_idx, floor, out_root))
    print(f"wrote {len(outputs)} action animations to {out_root}")
    return outputs
