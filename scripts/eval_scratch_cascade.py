"""Evaluate the ALL-FROM-SCRATCH cascade on the demo split.

Every weight here was trained by this framework with zero imported reference
parameters: IMU_Net (runs/300 -> artifacts/imu_net.ckpt.npz; upstream ships
no IMU checkpoint at all), Upper_Net (runs/311, random init), Lower_Net
(runs/312, random init, trained against the scratch upper).

Recorded result (2026-08-16, one TPU v5e chip):
    avg 3.645 cm  |  upper 3.376  |  lower 4.048  |  rot 5.62 deg
vs the reference's shipped-checkpoint numbers: avg 3.893, upper 3.51,
lower 4.49, rot 5.37 (README.md) -- parity target (<= 3.89 cm) met by the
standalone training path.
"""

from mmego_tpu.config import demo_config
from mmego_tpu import infer

if __name__ == "__main__":
    cfg = demo_config(
        model_upper_path="artifacts/scratch/upper_net.ckpt.npz",
        model_lower_path="artifacts/scratch/lower_net.ckpt.npz")
    infer.evaluate(cfg, return_preds=False)
