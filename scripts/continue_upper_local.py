"""Continue the UpperNetwlocal run to early-stop (round-2 cutoff: epoch 60,
4.58 cm eval error, still improving; plain UpperNet converges to 4.28 cm).

Resumes ``artifacts/upper_local_run/upper_local.ckpt.npz`` with the stage-2
trainer's ``--upper_local`` route and lets EarlyStopping(30) decide the end;
optional LADDER rungs then fine-tune at decreasing LR (same recipe as the
main cascade's refinement ladder).  Adopts each stop checkpoint back into
``artifacts/upper_local_run/`` and appends the eval trace to its logs.

Usage: python scripts/continue_upper_local.py [LR ...]   (default: 3e-5 1e-5)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _common import adopt
from mmego_tpu.config import Config
from mmego_tpu.train import loop

_RUN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "upper_local_run")
_CKPT = os.path.join(_RUN, "upper_local.ckpt.npz")


def main():
    lrs = [float(a) for a in sys.argv[1:]] or [3e-5, 1e-5]
    path = _CKPT
    for off, lr in enumerate(lrs):
        idx = 480 + off
        cfg = Config(idx=idx, upper_local=True, upper_pretrained=True,
                     model_upper_path=path, lr=lr)
        (_, _), ckpt = loop.train_upper(cfg, verbose=True, max_epochs=600)
        path = ckpt
        # keep the run's eval history in one place
        for name in ("log-loss.txt", "log-eval.txt"):
            src = os.path.join(cfg.report_root, str(idx), "report", name)
            with open(os.path.join(_RUN, name), "a") as dst, open(src) as s:
                dst.write(f"# continued, lr {lr:g} (runs/{idx})\n" + s.read())
        print(f"lr {lr:g}: stopped at {ckpt}", flush=True)
    adopt(path, _CKPT)
    print("adopted:", _CKPT, flush=True)


if __name__ == "__main__":
    main()
