#!/usr/bin/env python
"""Benchmark: full three-stage cascade over the 835-window demo set.

Same work as the reference's ``python main.py --infer`` (835 windows x 20
frames through IMU_Net -> Upper_Net -> Lower_Net), measured end-to-end after
one warmup compile.  Baseline: 29.5 it/s (reference README.md:97).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys

BASELINE_IT_S = 29.5


def main():
    from mmego_tpu.config import demo_config
    from mmego_tpu import infer
    from mmego_tpu.data import dataset as dataset_mod

    cfg = demo_config()
    data = dataset_mod.load_split(cfg, "vis")
    try:
        params, state = infer.load_cascade_params(cfg)
        trained_imu = True
    except FileNotFoundError:
        # No trained IMU checkpoint yet: keep the benchmark runnable with a
        # randomly initialised stage 1 (identical compute/throughput).
        import jax
        from mmego_tpu.models import imu_net, cascade
        from mmego_tpu.checkpoint import torch_import
        upper_p, upper_s = torch_import.import_upper(cfg.reference_upper_pth)
        lower_p, lower_s = torch_import.import_lower(cfg.reference_lower_pth)
        params = cascade.CascadeParams(
            imu=imu_net.imu_net_init(jax.random.PRNGKey(0)),
            upper=upper_p, lower=lower_p)
        state = cascade.CascadeState(upper=upper_s, lower=lower_s)
        trained_imu = False

    # backend numerics audit first: the cascade is batch-invariant by
    # construction, so any deviation is accelerator miscompilation -- fail
    # loudly instead of publishing corrupted numbers.
    # tol_cpu: cross-backend agreement with the CPU ground truth.  bf16 MXU
    # recurrence noise measures <2 cm worst-case per joint (nn/lstm.py:30-36);
    # miscompiles observed on this backend exceed 0.9 m.  3 cm separates them
    # with margin on both sides.
    from mmego_tpu.utils import selfcheck
    if not selfcheck.run(params, state, data, batch=835, tol_cpu=0.03):
        print(json.dumps({"metric": "cascade_inference_throughput",
                          "value": 0.0, "unit": "it/s", "vs_baseline": 0.0,
                          "error": "backend selfcheck failed"}))
        return 1

    # sweep device batch sizes, best-of-5 timed passes each (steady-state
    # throughput; compile excluded by the warmup inside evaluate()).  Five
    # passes because the tunneled backend sporadically stalls a host fetch
    # for seconds-to-minutes (docs/PERFORMANCE.md) -- best-of absorbs the
    # outliers; each pass is ~0.1 s of device time.
    best = None
    for batch in (167, 835):
        for _ in range(5):
            m = infer.evaluate(cfg, data=data, params=params, state=state,
                               verbose=False, batch=batch,
                               return_preds=False)
            m["batch"] = batch
            if best is None or m["it_per_s"] > best["it_per_s"]:
                best = m

    result = {
        "metric": "cascade_inference_throughput",
        "value": round(best["it_per_s"], 2),
        "unit": "it/s",
        "vs_baseline": round(best["it_per_s"] / BASELINE_IT_S, 2),
    }
    print(json.dumps(result))
    # context for humans on stderr (driver reads stdout's single line)
    print(f"windows={best['windows']} elapsed={best['elapsed_s']:.3f}s "
          f"avg_err={best['avg_cm']:.3f}cm (trained_imu={trained_imu}) "
          f"upper={best['upper_cm']:.3f} lower={best['lower_cm']:.3f} "
          f"rot={best['rot_deg']:.3f}deg", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
