"""Full stage-1 (IMU_Net) training run -> artifacts/imu_net.ckpt.npz.

The reference repo ships no IMU_Net checkpoint (SURVEY.md §0), so the
framework trains its own.  Protocol matches the reference
(`python main.py --train --network IMU_Net`): Adam(3e-5, wd 1e-3), batch 20,
up to 600 epochs with EarlyStopping(30).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import shutil

from mmego_tpu.config import Config
from mmego_tpu.train import loop

if __name__ == "__main__":
    cfg = Config(idx=300)
    params, ckpt = loop.train_imu(cfg)
    shutil.copy(ckpt, Config().model_imu_path)
    print("final checkpoint:", ckpt, "->", Config().model_imu_path)
