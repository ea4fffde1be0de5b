"""3-D skeleton rendering: single poses, per-frame SVG dumps, and
pred-vs-real action GIFs.

Headless reimplementation of the reference's drawing stack
(``Utils.py:107-246``, ``Utils_demo.py:180-323``,
``Util/Visual_Util/draw3Dpose.py``): identical view geometry (elev 16,
azim -107, radius 1, root-centred limits) but every artifact is written to
disk -- the ``--colab`` switch merely keeps the reference CLI surface, since
nothing here blocks on a display.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from mmego_tpu.config import (  # noqa: E402
    Config, SKELETON_ALL, SKELETON_UPPER, UPPER_JOINT_MAP)


def draw_pose(pose: np.ndarray, ax, floor: float, upper_only: bool = False):
    """Draw one 21-joint (or 15-joint upper) skeleton on a 3-D axis
    (Utils.py:152-194).

    ``floor`` is accepted but not rendered, matching the reference exactly:
    ``Utils_demo.py:152-161`` builds a floor-plane meshgrid from it but its
    only ``plot_surface`` call is commented out (``:132``), so reference
    artifacts ship without the plane.  Kept in the signature so per-frame
    ground heights stay plumbed for anyone re-enabling the plane.
    """
    pose = np.array(pose, copy=True)
    if not upper_only:
        pose[:, 1] -= 0.2
    radius = 1.0
    xroot, yroot, zroot = pose[0, 0], pose[0, 1], pose[0, 2]
    edges = SKELETON_UPPER if upper_only else SKELETON_ALL
    for a, b in edges:
        xs, ys, zs = [np.array([pose[a, i], pose[b, i]]) for i in range(3)]
        ax.plot(xs, ys, zs, lw=6, c="black", zorder=2)
    pts = pose[list(UPPER_JOINT_MAP)] if upper_only else pose
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c="green", s=60, marker="o",
               zorder=3, alpha=1.0)
    ax.set_xlim3d([-radius + xroot + 0.5, radius + xroot - 0.5])
    ax.set_zlim3d([-radius + zroot, radius + zroot - 0.2])
    ax.set_ylim3d([-radius + yroot + 0.5, radius + yroot - 0.5])
    ax.view_init(elev=16, azim=-107)
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")


def dump_pose_frames(pred: np.ndarray, real: np.ndarray, index: int,
                     floor: Sequence[float], out_root: str) -> None:
    """Per-frame pred/real SVG dump (Utils.py:197-246)."""
    for i in range(pred.shape[0]):
        d = os.path.join(out_root, str(i + index))
        os.makedirs(d, exist_ok=True)
        for tag, pose in (("pred", pred[i]), ("real", real[i])):
            fig = plt.figure(figsize=(5, 5))
            ax = fig.add_subplot(111, projection="3d")
            ax.set_box_aspect([1.5, 1.5, 1.5])
            draw_pose(pose, ax, floor[i])
            fig.savefig(os.path.join(d, f"{tag}_frame_{i + index}.svg"))
            plt.close(fig)


def action_gif(pred: np.ndarray, real: np.ndarray, batch_idx: int,
               floor: Sequence[float], out_root: str,
               fps: float = 1.0 / 0.6) -> Optional[str]:
    """Side-by-side pred-vs-real animation per action batch
    (Utils_demo.py:180-218; 0.6 s per frame)."""
    try:
        import imageio.v2 as imageio
    except ImportError:
        imageio = None
    os.makedirs(out_root, exist_ok=True)
    frames = []
    for i in range(pred.shape[0]):
        fig = plt.figure(figsize=(10, 5))
        ax1 = fig.add_subplot(121, projection="3d")
        ax2 = fig.add_subplot(122, projection="3d")
        ax1.set_title("Predicted Skeleton")
        ax2.set_title("Real Skeleton")
        draw_pose(pred[i], ax1, floor[i])
        draw_pose(real[i], ax2, floor[i])
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(buf.copy())
        plt.close(fig)
    if imageio is None:
        # fall back to a PNG strip when imageio is unavailable
        out = os.path.join(out_root, f"action_{batch_idx}.png")
        strip = np.concatenate(frames[: min(len(frames), 8)], axis=1)
        plt.imsave(out, strip)
        return out
    out = os.path.join(out_root, f"action_{batch_idx}.gif")
    imageio.mimsave(out, frames, duration=1.0 / fps)
    return out
