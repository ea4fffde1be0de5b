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

import glob
import re

from mmego_tpu.config import Config
from mmego_tpu.train import loop


def latest_ckpt(run_idx: int) -> str:
    """Newest (highest-epoch) param checkpoint of a run, sorted NUMERICALLY
    (lexicographic sort puts epoch99 after epoch349).  Skips non-epoch files
    such as the best-eval snapshot ``best.npz`` (cfg.save_best)."""
    paths = [(int(m.group(1)), p)
             for p in glob.glob(f"runs/{run_idx}/model/*.npz")
             if not p.endswith(".state.npz")
             for m in [re.search(r"epoch(\d+)", os.path.basename(p))] if m]
    if not paths:
        raise FileNotFoundError(f"no epoch checkpoints under runs/{run_idx}/model")
    return max(paths)[1]


if __name__ == "__main__":
    upper_run = int(sys.argv[1]) if len(sys.argv) > 1 else 311
    out_idx = int(sys.argv[2]) if len(sys.argv) > 2 else 312
    upper_ckpt = latest_ckpt(upper_run)
    print("using upper:", upper_ckpt, flush=True)
    cfg = Config(idx=out_idx, lower_pretrained=False, lr=3e-4,
                 model_upper_path=upper_ckpt)
    (_, _), ckpt = loop.train_lower(cfg)
    print("final from-scratch lower checkpoint:", ckpt)
