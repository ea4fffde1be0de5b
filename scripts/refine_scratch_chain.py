"""One full LR-ladder iteration over the ALL-FROM-SCRATCH cascade.

Fine-tunes IMU -> Upper -> Lower in order (each stage resumes the current
``artifacts/scratch`` checkpoint and early-stops), adopting each stage's stop
checkpoint before the next stage trains -- downstream stages are calibrated
to upstream *predictions*, so refreshing a stage without re-laddering its
dependents regresses the cascade (measured in round 2).  Evaluates the full
demo-split cascade after every stage.

Usage: python scripts/refine_scratch_chain.py LR [BASE_IDX] [--skip-imu]

History (demo-split avg, zero imported weights):
  iteration 1-2 (round 2, runs/449-455): 3.645 -> 3.352 -> 3.303 cm
  iteration 3 (round 3, lr 3e-6, runs/460x): see PARITY.md
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _common import adopt, stack_paths
from mmego_tpu.config import Config, demo_config
from mmego_tpu.train import loop
from mmego_tpu import infer


def scratch_paths():
    return stack_paths("scratch")


def evaluate(tag: str) -> float:
    m = infer.evaluate(demo_config(**scratch_paths()), verbose=False,
                       return_preds=False)
    print(f"[{tag}] avg {m['avg_cm']:.4f} cm (upper {m['upper_cm']:.4f} "
          f"lower {m['lower_cm']:.4f} rot {m['rot_deg']:.4f})", flush=True)
    return m["avg_cm"]


def main():
    # Flags and positionals may interleave: `LR [BASE_IDX] [--skip-imu]`.
    skip_imu = "--skip-imu" in sys.argv
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    lr = float(pos[0])
    base_idx = int(pos[1]) if len(pos) > 1 else 460
    paths = scratch_paths()

    evaluate("start")
    stages = [] if skip_imu else [
        ("imu", loop.train_imu, "imu_pretrained", "model_imu_path", 120, False)]
    stages += [
        ("upper", loop.train_upper, "upper_pretrained", "model_upper_path",
         250, True),
        ("lower", loop.train_lower, "lower_pretrained", "model_lower_path",
         250, True)]
    for off, (name, fn, flag, path_key, max_ep, has_state) in enumerate(stages):
        cfg = Config(idx=base_idx + off, lr=lr, **paths,
                     **{flag: True})
        out = fn(cfg, verbose=False, max_epochs=max_ep)
        ckpt = out[1]
        adopt(ckpt, paths[path_key], has_state)
        evaluate(f"after {name} (lr {lr:g}, stop ckpt {ckpt})")
    print("done", flush=True)


if __name__ == "__main__":
    main()
