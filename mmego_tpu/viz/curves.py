"""Headless training/eval plots: loss curves, accuracy curves, per-joint and
per-bone bar charts (reference ``Utils.py:354-414``; artifacts saved instead
of blocking ``plt.show`` windows)."""

from __future__ import annotations

import os
from typing import Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from mmego_tpu.config import Config  # noqa: E402

BONE_LABELS = ['20-3', '3-2', '2-1', '2-4', '2-8', '4-5', '5-6', '6-7',
               '8-9', '9-10', '10-11', '1-0', '0-12', '0-16', '12-13',
               '13-14', '14-15', '16-17', '17-18', '18-19']


def _plot_dir(cfg: Config) -> str:
    d = os.path.join(cfg.report_root, str(cfg.idx), "lossAndacc")
    os.makedirs(d, exist_ok=True)
    return d


def draw_curve(values: Sequence[float], name: str, cfg: Config,
               begin: int = 0) -> str:
    """Eval loss / accuracy vs epoch (Utils.py:368-390)."""
    titles = {"loss": ("Eval loss vs. epoch", "Eval loss", "Eval_loss.png"),
              "acc": ("Average Joint Localization Error vs. epoch",
                      "Average Joint Localization Error (m)",
                      "Eval_accuracy.png")}
    title, ylabel, fname = titles[name]
    xs = range(1 + begin, len(values) + 1)
    plt.figure()
    plt.title(title, fontsize=20)
    plt.plot(list(xs), list(values)[begin:], ".-")
    plt.xlabel("epoch", fontsize=15)
    plt.ylabel(ylabel, fontsize=15)
    plt.grid()
    out = os.path.join(_plot_dir(cfg), fname)
    plt.savefig(out)
    plt.close()
    return out


def draw_joint_bar(errors_cm: Sequence[float], cfg: Config) -> str:
    """Per-joint localization error bars (Utils.py:393-404).

    When the reference's joint-index legend image is available
    (``Resource/Img/Skeleton_index.png``), it is composited beside the bars
    as in the demo variant (``Utils_demo.py:502-529``); otherwise the bars
    ship alone (headless artifact, never a blocking ``plt.show``)."""
    index_img = os.path.join(os.path.dirname(cfg.data_root),
                             "Img", "Skeleton_index.png")
    if os.path.exists(index_img):
        fig, (ax, ax_img) = plt.subplots(
            1, 2, figsize=(12, 5), gridspec_kw={"width_ratios": [2, 1]})
        ax_img.imshow(plt.imread(index_img))
        ax_img.axis("off")
        ax_img.set_title("Joint index")
    else:
        fig, ax = plt.subplots()
    ax.set_xlabel("Joint Index", fontsize=15)
    ax.set_ylabel("Average Localization Error (cm)", fontsize=15)
    ax.bar(range(len(errors_cm)), errors_cm)
    ax.set_xticks(range(len(errors_cm)))
    out = os.path.join(_plot_dir(cfg), "Eval_joint_accuracy.png")
    fig.savefig(out)
    plt.close(fig)
    return out


def draw_bone_angle_bar(errors_deg: Sequence[float], cfg: Config) -> str:
    """Per-bone rotation error bars (Utils.py:405-414)."""
    plt.figure(figsize=(15, 5))
    plt.xlabel("Connectivity", fontsize=15)
    plt.ylabel("Rotation Error (°)", fontsize=15)
    plt.bar(range(len(errors_deg)), errors_deg, width=0.6,
            tick_label=BONE_LABELS[: len(errors_deg)])
    out = os.path.join(_plot_dir(cfg), "Eval_joint_angle.png")
    plt.savefig(out)
    plt.close()
    return out


def plot_confusion(matrix, cfg: Config, labels: Sequence[str] = None) -> str:
    """Action-recognition confusion heatmap (Utils.py:50-71; matplotlib-only,
    no seaborn dependency)."""
    import numpy as np
    m = np.asarray(matrix, dtype=float)
    n = m.shape[0]
    labels = labels or [f"({i})" for i in range(1, n + 1)]
    fig, ax = plt.subplots(figsize=(10, 6))
    ax.imshow(m, cmap="Blues")
    for i in range(n):
        for j in range(n):
            ax.text(j, i, f"{m[i, j]:g}", ha="center", va="center", fontsize=9)
    ax.set_xticks(range(n), labels)
    ax.set_yticks(range(n), labels)
    ax.set_xlabel("True Action", fontsize=18)
    ax.set_ylabel("Predicted Action", fontsize=18)
    d = os.path.join(cfg.report_root, str(cfg.idx), "svg")
    os.makedirs(d, exist_ok=True)
    out = os.path.join(d, "action_rec.svg")
    fig.savefig(out)
    plt.close(fig)
    return out


def draw_frame_loss(loss_angle: Sequence[float], loss_pos: Sequence[float],
                    cfg: Config, name: str = "eval_loss_per_frame") -> str:
    """Per-frame angle/position error curves (Utils.py:354-365)."""
    xs = range(1, len(loss_angle) + 1)
    plt.figure(figsize=(15, 5))
    plt.title("Eval loss vs. frame", fontsize=20)
    plt.plot(list(xs), list(loss_angle), ".-", label="angle")
    plt.plot(list(xs), list(loss_pos), ".-", label="H_pos")
    plt.xlabel("Frame", fontsize=15)
    plt.ylabel("Eval loss", fontsize=15)
    plt.grid()
    plt.legend(loc=0, prop={"size": 20})
    out = os.path.join(_plot_dir(cfg), f"{name}.svg")
    plt.savefig(out)
    plt.close()
    return out
