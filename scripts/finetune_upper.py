"""Fine-tune Upper_Net against this framework's own IMU_Net.

The shipped Upper/Lower checkpoints were trained on the *reference's* IMU
outputs (whose checkpoint is lost upstream); re-training stages 2-3 against
our stage 1 closes the stage-boundary distribution gap.  Initialises from the
shipped torch checkpoint and follows the reference protocol (Adam 3e-5,
batch 20, EarlyStopping 30).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmego_tpu.config import Config
from mmego_tpu.train import loop

if __name__ == "__main__":
    cfg = Config(idx=301, upper_pretrained=True)
    (_, _), ckpt = loop.train_upper(cfg)
    print("final upper checkpoint:", ckpt)
