"""Full-cascade metrics on the 167 HELD-OUT test windows (never trained on).

The reference's published protocol evaluates over all 835 windows -- ~80%
of them training windows (its README block; our headline table uses the
same convention for like-for-like comparison).  This script reports the
complementary generalization number for any stack; the shipped results for
both stacks are tabulated in docs/PARITY.md.

Usage: python scripts/eval_heldout.py [scratch|reference_seeded|headline]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The ambient sitecustomize registers the remote-TPU PJRT plugin in every
# interpreter; with only the env var set, the first jax.devices() call
# still dials the (possibly unreachable) tunnel.  The helper pins the
# config before any backend init -- same reason tests/conftest.py does.
from mmego_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np
import jax.numpy as jnp

from _common import stack_paths
from mmego_tpu.config import demo_config
from mmego_tpu.data import dataset as dataset_mod
from mmego_tpu import infer
from mmego_tpu.train import metrics as mm


def heldout(tag: str, seed: int = None, **paths) -> dict:
    cfg = demo_config(**paths)
    if seed is not None:
        cfg = cfg.replace(dataset_random_seed=seed)
    test = dataset_mod.load_split(cfg, "test")
    params, state = infer.load_cascade_params(cfg)
    out = infer.run_cascade_batched(params, state, test, len(test))
    s = mm.metric_sums(jnp.asarray(out["all"]), jnp.asarray(test.key),
                       jnp.asarray(out["upper"]), jnp.asarray(out["lower"]))
    m = mm.finalize_metric_sums([{k: np.asarray(v) for k, v in s.items()}])
    print(f"[{tag}] held-out avg {m['avg_cm']:.4f} cm (upper "
          f"{m['upper_cm']:.4f} lower {m['lower_cm']:.4f} "
          f"rot {m['rot_deg']:.4f} deg), seed "
          f"{cfg.dataset_random_seed}, {len(test)} windows", flush=True)

    # Per-action breakdown (the reference's Demo_test.eval_all_skeleton
    # walks actions, /root/reference/Processor/Test/Demo_test.py:186-247;
    # here the per-window action id rides the packed arrays).  Per-window
    # mean joint error in cm, grouped by action.
    err = np.sqrt(np.sum((np.asarray(out["all"], np.float64)
                          - np.asarray(test.key)) ** 2, axis=-1)) * 100.0
    per_window = err.mean(axis=(1, 2))                       # (W,)
    print(f"[{tag}] per-action held-out error (cm):", flush=True)
    for act in np.unique(test.action):
        sel = test.action == act
        print(f"  action {int(act):2d}: {per_window[sel].mean():7.3f} cm "
              f"over {int(sel.sum()):3d} windows", flush=True)

    # Honest variance bound on the held-out average: bootstrap the window
    # set (the only sampling unit; frames within a window are correlated).
    rs = np.random.RandomState(0)
    n = len(per_window)
    boots = per_window[rs.randint(0, n, size=(10000, n))].mean(axis=1)
    lo, hi = np.percentile(boots, [2.5, 97.5])
    print(f"[{tag}] bootstrap 95% CI of the held-out avg: "
          f"[{lo:.3f}, {hi:.3f}] cm (10k resamples of {n} windows)",
          flush=True)
    m["per_action_cm"] = {int(a): float(per_window[test.action == a].mean())
                          for a in np.unique(test.action)}
    m["ci95_cm"] = (float(lo), float(hi))
    return m


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "headline"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else None
    heldout(which, seed=seed, **stack_paths(which))
