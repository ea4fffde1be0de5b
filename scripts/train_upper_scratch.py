"""Train Upper_Net FROM SCRATCH (random init) against our IMU_Net.

Demonstrates the full standalone training path (no reference weights
involved); reference protocol: Adam 3e-5, batch 20, EarlyStopping(30).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmego_tpu.config import Config
from mmego_tpu.train import loop

if __name__ == "__main__":
    cfg = Config(idx=311, upper_pretrained=False)
    (_, _), ckpt = loop.train_upper(cfg)
    print("final from-scratch upper checkpoint:", ckpt)
