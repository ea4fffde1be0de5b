"""Fine-tune Lower_Net against our IMU_Net + the fine-tuned Upper_Net.

Initialises from the shipped torch checkpoint; lr 3e-4 matches the shipped
lower checkpoint's provenance (epoch161_batch20frame20lr0.0003).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmego_tpu.config import Config
from mmego_tpu.train import loop
from train_lower_scratch import latest_ckpt

if __name__ == "__main__":
    # numeric pick: lexicographic sorted(...)[-1] returns epoch99 over
    # epoch161, silently resuming from a stale model
    upper_ckpt = latest_ckpt(301)
    print("using upper:", upper_ckpt)
    cfg = Config(idx=302, lower_pretrained=True, lr=3e-4,
                 model_upper_path=upper_ckpt)
    (_, _), ckpt = loop.train_lower(cfg)
    print("final lower checkpoint:", ckpt)
