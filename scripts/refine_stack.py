"""One LR-ladder iteration over ANY checkpoint stack directory.

Generalisation of refine_scratch_chain.py: fine-tunes IMU -> Upper ->
Lower in order on ``artifacts/<stack>/`` (each stage resumes the stack's
current checkpoint and early-stops; stop checkpoints are adopted before
the next stage trains, since downstream stages calibrate to upstream
predictions).  Evaluates BOTH protocols after every stage: the demo split
(the reference's published convention) and the 167 held-out windows.

Supports the round-5 train-time augmentation flags, so the
generalization-preserving refinement of the augmented stacks can be
ladder-iterated like the round-3 scratch chains were.

Usage: python scripts/refine_stack.py STACK LR BASE_IDX
         [--skip-imu] [--augment-overlap] [--jitter SIGMA]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmego_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

from _common import adopt, stack_paths
from eval_heldout import heldout
from mmego_tpu.config import Config, demo_config
from mmego_tpu.train import loop
from mmego_tpu import infer


def evaluate(tag: str, paths) -> float:
    m = infer.evaluate(demo_config(**paths), verbose=False,
                       return_preds=False)
    print(f"[{tag}] demo avg {m['avg_cm']:.4f} cm (upper {m['upper_cm']:.4f} "
          f"lower {m['lower_cm']:.4f} rot {m['rot_deg']:.4f})", flush=True)
    return m["avg_cm"]


def main():
    argv = sys.argv[1:]
    skip_imu = "--skip-imu" in argv
    aug = {}
    if "--augment-overlap" in argv:
        aug["augment_overlap"] = True
    if "--jitter" in argv:
        i = argv.index("--jitter")
        aug["augment_cloud_sigma"] = float(argv[i + 1])
        del argv[i:i + 2]
    pos = [a for a in argv if not a.startswith("--")]
    stack, lr, base_idx = pos[0], float(pos[1]), int(pos[2])
    paths = stack_paths(stack)
    if not paths:
        # 'headline' resolves to {} (config defaults) -- adopt() below
        # would KeyError AFTER a full training stage; fail before training.
        raise SystemExit(
            f"stack {stack!r} has no explicit checkpoint paths; refine a "
            "named artifacts/<stack>/ directory (copy the headline "
            "artifacts into one first)")

    evaluate("start", paths)
    stages = [] if skip_imu else [
        ("imu", loop.train_imu, "imu_pretrained", "model_imu_path", 120,
         False, {})]
    stages += [
        ("upper", loop.train_upper, "upper_pretrained", "model_upper_path",
         250, True, aug),
        ("lower", loop.train_lower, "lower_pretrained", "model_lower_path",
         250, True, aug)]
    for off, (name, fn, flag, path_key, max_ep, has_state, st_aug) in \
            enumerate(stages):
        cfg = Config(idx=base_idx + off, lr=lr, **paths, **st_aug,
                     **{flag: True})
        _, ckpt = fn(cfg, verbose=False, max_epochs=max_ep)
        adopt(ckpt, paths[path_key], has_state)
        evaluate(f"after {name} (lr {lr:g})", paths)
    heldout(f"{stack} post-ladder lr {lr:g}", **paths)
    print("done", flush=True)


if __name__ == "__main__":
    main()
