"""Held-out prediction ensembling across independently trained stacks.

VERDICT r4 #2 asked for an *attack* on the held-out plateau (5.060 cm,
CI [4.80, 5.34]).  Prediction-level ensembling is the variance-reduction
arm: run the full cascade of N stacks trained on the SAME seed-1 split
(different init/provenance), average the predicted joint positions, and
score the averaged skeleton on the 167 held-out windows.

Leakage note: only stacks trained on the seed-1 split are eligible --
``artifacts/seed2`` trained on a different split whose training windows
include seed-1's held-out windows, so it must NOT be a member.

Usage: python scripts/ensemble_eval.py [stack ...]   (default: headline
reference_seeded, plus any artifacts/chain*/ stacks that exist)
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmego_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np
import jax.numpy as jnp

from _common import ARTIFACTS, stack_paths
from mmego_tpu.config import demo_config
from mmego_tpu.data import dataset as dataset_mod
from mmego_tpu import infer
from mmego_tpu.train import metrics as mm


def _score(tag, preds, test):
    s = mm.metric_sums(jnp.asarray(preds["all"]), jnp.asarray(test.key),
                       jnp.asarray(preds["upper"]), jnp.asarray(preds["lower"]))
    m = mm.finalize_metric_sums([{k: np.asarray(v) for k, v in s.items()}])
    err = np.sqrt(np.sum((np.asarray(preds["all"], np.float64)
                          - np.asarray(test.key)) ** 2, axis=-1)) * 100.0
    per_window = err.mean(axis=(1, 2))
    rs = np.random.RandomState(0)
    n = len(per_window)
    boots = per_window[rs.randint(0, n, size=(10000, n))].mean(axis=1)
    lo, hi = np.percentile(boots, [2.5, 97.5])
    print(f"[{tag}] held-out avg {m['avg_cm']:.4f} cm (upper "
          f"{m['upper_cm']:.4f} lower {m['lower_cm']:.4f} rot "
          f"{m['rot_deg']:.4f} deg)  CI95 [{lo:.3f}, {hi:.3f}]", flush=True)
    return m, per_window


def main():
    names = sys.argv[1:]
    if not names:
        names = ["headline", "reference_seeded"]
        names += sorted(os.path.basename(d) for d in
                        glob.glob(os.path.join(ARTIFACTS, "chain*")))
    print(f"[ensemble] members: {names}", flush=True)

    cfg = demo_config()
    test = dataset_mod.load_split(cfg, "test")

    member_preds = []
    for name in names:
        params, state = infer.load_cascade_params(
            cfg.replace(**stack_paths(name)))
        preds = infer.run_cascade_batched(params, state, test, len(test))
        _score(name, preds, test)
        member_preds.append(preds)

    for k_end in range(2, len(member_preds) + 1):
        avg = {k: np.mean([p[k] for p in member_preds[:k_end]], axis=0)
               for k in ("upper", "lower", "all")}
        _score(f"ensemble[{'+'.join(names[:k_end])}]", avg, test)


if __name__ == "__main__":
    main()
