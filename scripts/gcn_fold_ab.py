"""A/B one cascade-level setting on the real TPU: run the full demo-set
evaluation under the CURRENT environment and print one JSON line.

Any trace-time env switch (MMEGO_PALLAS_*, MMEGO_LSTM_PIPE, ...) can be
A/B'd by running this once per setting in a fresh process (the switches
are read at trace time).  Prints best + median it/s over PASSES timed
passes at the whole-set batch plus the demo metrics (the B side must not
move them).

History: built for the deferred `MMEGO_GCN_FOLD` measurement, which it
settled on 2026-08-20 (fold OFF 10,425 it/s median vs ON 10,328 at
identical metrics -> the fold was deleted; note in models/stgcn.py).
"""

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmego_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

from mmego_tpu.config import demo_config
from mmego_tpu.data import dataset as dataset_mod
from mmego_tpu import infer

PASSES = 7


def main():
    cfg = demo_config()
    data = dataset_mod.load_split(cfg, "vis")
    params, state = infer.load_cascade_params(cfg)
    rates, last = [], None
    for _ in range(PASSES):
        last = infer.evaluate(cfg, data=data, params=params, state=state,
                              verbose=False, batch=835, return_preds=False)
        rates.append(last["it_per_s"])
    print(json.dumps({
        "env": {k: v for k, v in os.environ.items()
                if k.startswith("MMEGO_")},
        "best_it_s": round(max(rates), 2),
        "median_it_s": round(statistics.median(rates), 2),
        "avg_cm": round(float(last["avg_cm"]), 4),
        "rot_deg": round(float(last["rot_deg"]), 4)}), flush=True)


if __name__ == "__main__":
    main()
