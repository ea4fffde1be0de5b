"""Train Lower_Net FROM SCRATCH against the from-scratch IMU_Net + Upper_Net.

Completes the zero-imported-weights cascade: IMU (runs/300 ->
artifacts/imu_net.ckpt.npz) -> Upper (runs/311, random init) -> Lower (this
run, random init).  lr 3e-4 matches the reference lower stage's provenance
(its shipped checkpoint is epoch161_batch20frame20lr0.0003).

Usage: python scripts/train_lower_scratch.py [upper_run_idx] [out_idx]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmego_tpu.checkpoint import store
from mmego_tpu.config import Config
from mmego_tpu.train import loop


def latest_ckpt(run_idx: int) -> str:
    """Newest (highest-epoch) param checkpoint of a run (numeric epoch sort,
    BN-state sidecars and best.npz skipped -- checkpoint/store.latest_epoch).
    Anchored at Config.report_root, NOT the cwd, so the scripts work from
    any directory."""
    d = os.path.join(Config().report_root, str(run_idx), "model")
    path = store.latest_epoch(d)
    if path is None:
        raise FileNotFoundError(f"no epoch checkpoints under {d}")
    return path


if __name__ == "__main__":
    upper_run = int(sys.argv[1]) if len(sys.argv) > 1 else 311
    out_idx = int(sys.argv[2]) if len(sys.argv) > 2 else 312
    upper_ckpt = latest_ckpt(upper_run)
    print("using upper:", upper_ckpt, flush=True)
    cfg = Config(idx=out_idx, lower_pretrained=False, lr=3e-4,
                 model_upper_path=upper_ckpt)
    (_, _), ckpt = loop.train_lower(cfg)
    print("final from-scratch lower checkpoint:", ckpt)
