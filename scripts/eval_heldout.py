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


def heldout(tag: str, **paths) -> dict:
    cfg = demo_config(**paths)
    test = dataset_mod.load_split(cfg, "test")
    params, state = infer.load_cascade_params(cfg)
    out = infer.run_cascade_batched(params, state, test, len(test))
    s = mm.metric_sums(jnp.asarray(out["all"]), jnp.asarray(test.key),
                       jnp.asarray(out["upper"]), jnp.asarray(out["lower"]))
    m = mm.finalize_metric_sums([{k: np.asarray(v) for k, v in s.items()}])
    print(f"[{tag}] held-out avg {m['avg_cm']:.4f} cm (upper "
          f"{m['upper_cm']:.4f} lower {m['lower_cm']:.4f} "
          f"rot {m['rot_deg']:.4f} deg)", flush=True)
    return m


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "headline"
    heldout(which, **stack_paths(which))
