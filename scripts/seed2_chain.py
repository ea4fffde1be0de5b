"""Independent split-seed robustness run: full scratch chain on seed 2.

The headline held-out number (5.06 cm, docs/PARITY.md) rests on ONE
train/test split draw (``dataset_random_seed=1``, the reference's own
seed, ``/root/reference/Config/config.py:70``).  This script makes the
generalization claim robust to the split: re-split with seed 2, train the
whole cascade from scratch on the new 80% (IMU -> Upper -> Lower, the
reference protocol budgets), and report the seed-2 held-out metrics with
the same per-action breakdown.  The result is an independent draw of
(split, init, training) -- if it lands inside the seed-1 bootstrap CI
band, the 5 cm generalization figure is not a split-seed artifact.

NOTE a seed-2 *evaluation* of the seed-1-trained stack would be
meaningless: ~80% of seed-2's "held-out" windows are seed-1 training
windows.  Only retraining gives an uncontaminated second draw.

Artifacts land in artifacts/seed2/; runs use idx 520-522.

Usage: python scripts/seed2_chain.py [--refine]  (--refine adds one
lr 3e-5 -> 1e-5 fine-tuning ladder over Upper/Lower, mirroring one
refine_scratch_chain iteration, before the final eval)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmego_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

from _common import ARTIFACTS, adopt
from eval_heldout import heldout
from mmego_tpu.config import Config
from mmego_tpu.train import loop

SEED = 2
OUT = os.path.join(ARTIFACTS, "seed2")


def paths():
    return dict(model_imu_path=os.path.join(OUT, "imu_net.ckpt.npz"),
                model_upper_path=os.path.join(OUT, "upper_net.ckpt.npz"),
                model_lower_path=os.path.join(OUT, "lower_net.ckpt.npz"))


def train_stage(name, fn, idx, lr, **cfg_kw):
    cfg = Config(idx=idx, lr=lr, dataset_random_seed=SEED, **paths(),
                 **cfg_kw)
    out = fn(cfg, verbose=False)
    ckpt = out[1]
    dest = os.path.join(OUT, f"{name}_net.ckpt.npz")
    adopt(ckpt, dest, with_state=name != "imu")
    print(f"[seed2] {name} done -> {dest}", flush=True)


def main():
    os.makedirs(OUT, exist_ok=True)
    # Stage budgets/lrs follow the provenance of the shipped reference
    # checkpoints (imu/upper 3e-5; lower 3e-4 -- its .pth name is
    # epoch161_...lr0.0003) and the scripts/train_*_scratch.py recipes.
    train_stage("imu", loop.train_imu, 520, 3e-5)
    train_stage("upper", loop.train_upper, 521, 3e-5,
                upper_pretrained=False)
    train_stage("lower", loop.train_lower, 522, 3e-4,
                lower_pretrained=False)
    if "--refine" in sys.argv:
        for off, lr in enumerate((3e-5, 1e-5)):
            train_stage("upper", loop.train_upper, 530 + 2 * off, lr,
                        upper_pretrained=True)
            train_stage("lower", loop.train_lower, 531 + 2 * off, lr,
                        lower_pretrained=True)
    heldout("seed2", seed=SEED, **paths())


if __name__ == "__main__":
    main()
