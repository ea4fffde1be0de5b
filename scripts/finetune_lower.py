"""Fine-tune Lower_Net against our IMU_Net + the fine-tuned Upper_Net.

Initialises from the shipped torch checkpoint; lr 3e-4 matches the shipped
lower checkpoint's provenance (epoch161_batch20frame20lr0.0003).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob

from mmego_tpu.config import Config
from mmego_tpu.train import loop

if __name__ == "__main__":
    upper_ckpts = sorted(glob.glob("runs/301/model/*.npz"))
    upper_ckpt = [p for p in upper_ckpts if not p.endswith(".state.npz")][-1]
    print("using upper:", upper_ckpt)
    cfg = Config(idx=302, lower_pretrained=True, lr=3e-4,
                 model_upper_path=upper_ckpt)
    (_, _), ckpt = loop.train_lower(cfg)
    print("final lower checkpoint:", ckpt)
