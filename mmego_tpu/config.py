"""Configuration for the mmEgo-TPU framework.

A single frozen dataclass replaces the reference's pair of mutable static
classes (``Config/config.py`` and ``Config/config_demo.py`` in the reference
tree).  Two profiles -- ``train`` and ``demo`` -- reproduce the reference's
split; CLI overrides are applied functionally via :func:`dataclasses.replace`
instead of class-attribute mutation (reference ``main.py:28-46``).

Skeleton topology tables mirror reference ``Config/config.py:37-55`` exactly;
they are the kinematic ground truth of the whole system.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ---------------------------------------------------------------------------
# Skeleton topology (reference Config/config.py:37-55).
#
# 21 joints selected from the 32-joint Azure Kinect skeleton.  Bone edges are
# listed (parent, child) in topological order: every parent appears as a child
# of an earlier edge (or is a seed joint), which is what lets forward
# kinematics run as a prefix-sum over root-to-joint paths (see ops/kinematics).
# ---------------------------------------------------------------------------

SKELETON_ALL: Tuple[Tuple[int, int], ...] = (
    (20, 3), (3, 2), (2, 1), (2, 4), (2, 8), (4, 5), (5, 6), (6, 7),
    (8, 9), (9, 10), (10, 11), (1, 0), (0, 12), (0, 16),
    (12, 13), (13, 14), (14, 15), (16, 17), (17, 18), (18, 19),
)
# The first 14 edges span the upper body, the last 6 the lower body.
SKELETON_UPPER: Tuple[Tuple[int, int], ...] = SKELETON_ALL[:14]
SKELETON_LOWER: Tuple[Tuple[int, int], ...] = SKELETON_ALL[14:]

# Undirected neighbour edges of the 15-node upper-body graph used by the
# ST-GCN key encoder (reference Config/config.py:45-47).
KINECT_UPPER_GRAPH: Tuple[Tuple[int, int], ...] = (
    (0, 12), (0, 13), (0, 1), (1, 2), (2, 3), (2, 4),
    (2, 8), (3, 14), (4, 5), (5, 6), (6, 7), (8, 9),
    (9, 10), (10, 11),
)

# 21-of-32 Azure Kinect joint selection (reference Config/config.py:49).
KINECT_JOINT_SELECTION: Tuple[int, ...] = (
    0, 1, 2, 3, 4, 5, 6, 7, 11, 12, 13, 14, 18, 19, 20, 21, 22, 23, 24, 25, 26,
)

# Global joint ids covered by each stage (reference Config/config.py:51-55).
UPPER_JOINT_MAP: Tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 16, 20)
LOWER_JOINT_MAP: Tuple[int, ...] = (12, 13, 14, 15, 16, 17, 18, 19)
HAND_JOINT_MAP: Tuple[int, ...] = (7, 6, 11, 10)  # l-wrist, l-elbow, r-wrist, r-elbow


def skeleton_all_np() -> np.ndarray:
    return np.asarray(SKELETON_ALL, dtype=np.int64)


def skeleton_upper_np() -> np.ndarray:
    return np.asarray(SKELETON_UPPER, dtype=np.int64)


def skeleton_lower_np() -> np.ndarray:
    return np.asarray(SKELETON_LOWER, dtype=np.int64)


@dataclasses.dataclass(frozen=True)
class Config:
    """Hyperparameters and paths (reference Config/config.py:16-70)."""

    # Experiment index; names report/model output directories.
    idx: int = 1001
    # Plot prefix-trim length (reference ``pb``).
    plot_begin: int = 10

    # Window / cloud geometry.
    frame_no: int = 20          # frames per window
    pc_no: int = 128            # padded point-cloud size
    lower_pc_no: int = 64       # points kept by the lower-body stage

    # Optimisation.
    epochs: int = 600
    lr: float = 3e-5
    batch_size: int = 20
    early_stop_patience: int = 30
    save_slot: int = 50
    # also write the best-eval-loss checkpoint as model/best.npz (the
    # reference saves only at stop time, patience epochs past the best)
    save_best: bool = True

    # Joint counts.
    joint_num_all: int = 21
    joint_num_upper: int = 15
    joint_num_lower: int = 8
    num_action: int = 13

    # Behaviour switches.
    imu_used: bool = True
    # Train/evaluate the anchor-voxel local variant (models/upper_local.py,
    # reference Net/Upper_Net.py:406-451 -- defined upstream but never
    # instantiated by any trainer there; wired in here).
    upper_local: bool = False
    imu_pretrained: bool = False
    upper_pretrained: bool = False
    lower_pretrained: bool = False
    colab: bool = False
    batch_per_action: int = 3   # demo profile: windows kept per action for --vis

    # Data.
    data_root: str = os.path.join(_REPO_ROOT, "..", "reference", "Resource", "Sample_data")
    cache_dir: str = os.path.join(_REPO_ROOT, ".cache")
    dataset_random_seed: int = 1
    # Seed for the point-cloud pad/subsample RNG.  The reference leaves this
    # unseeded (Dataset_sample.py:215-224); we pin it for reproducibility.
    padding_seed: int = 0

    # Train-time augmentation (this framework only; the reference has none).
    # augment_overlap: per epoch, add phase-shifted windows synthesised from
    # time-adjacent TRAIN window pairs of the same snippet (the loader's
    # tail-first chopping discards phase diversity, Dataset_sample.py:235-262;
    # built strictly from train-split frames -- zero held-out leakage).
    augment_overlap: bool = False
    # augment_cloud_sigma: train-time Gaussian jitter (metres) on the real
    # (non-zero) cloud points' xyz; the range feature is recomputed.
    augment_cloud_sigma: float = 0.0

    # Checkpoint paths.  Defaults are this framework's own FROM-SCRATCH
    # trained weights under artifacts/ -- zero imported reference parameters
    # (the upstream repo ships no IMU checkpoint at all, SURVEY.md §0, and
    # its Upper/Lower weights pair with that lost IMU net).  The
    # reference-seeded stack (torch-imported Upper/Lower, fine-tuned) lives
    # in artifacts/reference_seeded/; infer.load_cascade_params falls back
    # to the reference .pth files when an artifacts checkpoint is absent.
    model_imu_path: str = os.path.join(_REPO_ROOT, "artifacts", "imu_net.ckpt.npz")
    model_upper_path: str = os.path.join(_REPO_ROOT, "artifacts", "upper_net.ckpt.npz")
    model_lower_path: str = os.path.join(_REPO_ROOT, "artifacts", "lower_net.ckpt.npz")
    # Reference torch checkpoints (importable directly via --load_*_path).
    reference_upper_pth: str = os.path.join(
        _REPO_ROOT, "..", "reference", "Resource", "Pretrained_model",
        "Upper_Net", "epoch451_batch20frame20lr3e-05.pth")
    reference_lower_pth: str = os.path.join(
        _REPO_ROOT, "..", "reference", "Resource", "Pretrained_model",
        "Lower_Net", "epoch161_batch20frame20lr0.0003.pth")

    # Output directories (reports, checkpoints, figures).
    report_root: str = os.path.join(_REPO_ROOT, "runs")

    # Runtime.
    infer_batch: int = 835      # windows per device batch during inference
    compute_dtype: str = "float32"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def demo_config(**kw) -> Config:
    """The demo/inference profile (reference Config/config_demo.py)."""
    base = dict(idx=1)
    base.update(kw)
    return Config(**base)


DEFAULT = Config()
