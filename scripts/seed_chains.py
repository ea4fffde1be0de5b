"""Extra from-scratch chains on the SAME seed-1 split, different init seeds.

Ensemble members for scripts/ensemble_eval.py (VERDICT r4 #2): each chain
retrains the whole cascade (IMU -> Upper -> Lower, reference protocol
budgets + one lr refine ladder) with a different weight-init/shuffle seed,
on the UNCHANGED seed-1 train split -- so the 167 held-out windows stay
uncontaminated and the stacks are valid ensemble members alongside the
headline stack.

Usage: python scripts/seed_chains.py <seed> [--no-refine]
       [--augment-overlap] [--jitter SIGMA]
Artifacts land in artifacts/chain<seed>/ (suffix ``_aug`` when augmenting);
runs use idx 60<seed>*.  The augmentation flags run the same chain with
train-time phase-shift / cloud-jitter augmentation (Config.augment_*) --
the measured arm of VERDICT r4 #2's technique list.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmego_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

from _common import ARTIFACTS, adopt
from eval_heldout import heldout
from mmego_tpu.config import Config
from mmego_tpu.train import loop


def main():
    seed = int(sys.argv[1])
    aug = {}
    tag = f"chain{seed}"
    if "--augment-overlap" in sys.argv:
        aug["augment_overlap"] = True
    if "--jitter" in sys.argv:
        aug["augment_cloud_sigma"] = float(
            sys.argv[sys.argv.index("--jitter") + 1])
    if aug:
        tag += "_aug"
    out = os.path.join(ARTIFACTS, tag)
    os.makedirs(out, exist_ok=True)
    paths = dict(model_imu_path=os.path.join(out, "imu_net.ckpt.npz"),
                 model_upper_path=os.path.join(out, "upper_net.ckpt.npz"),
                 model_lower_path=os.path.join(out, "lower_net.ckpt.npz"))

    def stage(name, fn, idx, lr, **kw):
        # stage-1 has no cloud input; augmentation applies to stages 2/3
        stage_aug = {} if fn is loop.train_imu else aug
        cfg = Config(idx=idx, lr=lr, **paths, **stage_aug, **kw)
        _, ckpt = fn(cfg, seed=seed, verbose=False)
        adopt(ckpt, os.path.join(out, f"{name}_net.ckpt.npz"),
              with_state=name != "imu")
        print(f"[chain{seed}] {name} done", flush=True)

    # _aug chains get their own idx band so runs/<idx> never collides with
    # the plain chain of the same seed.
    base_idx = (6000 if not aug else 6500) + seed * 10
    # Stage budgets/lrs follow the shipped-reference provenance
    # (imu/upper 3e-5, lower 3e-4; scripts/train_*_scratch.py).
    stage("imu", loop.train_imu, base_idx + 0, 3e-5)
    stage("upper", loop.train_upper, base_idx + 1, 3e-5)
    stage("lower", loop.train_lower, base_idx + 2, 3e-4)
    if "--no-refine" not in sys.argv:
        for off, lr in enumerate((3e-5, 1e-5)):
            stage("upper", loop.train_upper, base_idx + 3 + 2 * off, lr,
                  upper_pretrained=True)
            stage("lower", loop.train_lower, base_idx + 4 + 2 * off, lr,
                  lower_pretrained=True)
    heldout(f"chain{seed}", **paths)


if __name__ == "__main__":
    main()
