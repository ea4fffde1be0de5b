#!/usr/bin/env python
"""Benchmark: full three-stage cascade over the 835-window demo set.

Same work as the reference's ``python main.py --infer`` (835 windows x 20
frames through IMU_Net -> Upper_Net -> Lower_Net), measured end-to-end after
one warmup compile.  Baseline: 29.5 it/s (reference README.md:97).

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
A second, training-throughput JSON line goes to stderr (stdout stays a single
line for the driver); ``python bench.py --train`` emits only the training
line, on stdout.
"""

import json
import sys

BASELINE_IT_S = 29.5

# The reference publishes no training numbers at all (SURVEY.md §4); its only
# training-cadence artifact is the tqdm it/s readout of its per-batch host
# loop (reference Train_IMU.py:95), which shares the per-window host loop
# with its 29.5 it/s inference path.  An OPTIMISTIC floor for one reference
# epoch (668 train + 167 eval windows at 29.5 windows/s, pretending backward
# is free) is therefore (668+167)/29.5 = 28.3 s per stage.
BASELINE_EPOCH_S = (668 + 167) / BASELINE_IT_S


def _load_params(cfg):
    from mmego_tpu import infer

    try:
        return infer.load_cascade_params(cfg) + (True,)
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
        return params, state, False


def _selfcheck(params, state, data, full: bool = True) -> bool:
    # backend numerics audit first: the cascade is batch-invariant by
    # construction, so any deviation is accelerator miscompilation -- fail
    # loudly instead of publishing corrupted numbers.  Three gates:
    #  * batch invariance (1 cm): same-backend miscompile detector.
    #  * kernel-vs-scan (1.5 cm + shared 0.05 cm metric gap): the budget a
    #    Pallas kernel edit may spend, measured against the scan path on the
    #    SAME backend so ambient backend noise cancels (measured 9.1e-3 m /
    #    0.0009 cm on round-3 weights).
    #  * CPU cross-check (0.1 m + 0.05 cm metric gap): cross-backend
    #    miscompile detector anchored to the f32 ground truth the unit tests
    #    use.  Its legal max-joint deviation is weight-sharpness-dependent
    #    chaotic amplification (3.6e-2 m on round-3 weights, UNCHANGED with
    #    kernels off at highest precision -- see selfcheck.run docstring),
    #    so only the mean-metric gap is held tight; 0.1 m sits ~3x above
    #    legal noise and ~9x below the observed 0.9 m miscompile signature.
    from mmego_tpu.utils import selfcheck
    if not full:
        # CPU fallback: the batch-invariance gate does not need the full
        # 835-window pass (~3 min on CPU) to catch a miscompile -- audit a
        # 128-window slice so the driver still gets its JSON line promptly.
        data = data.take(slice(0, 128))
        return selfcheck.run(params, state, data, batch=len(data),
                             tol_cpu=0.1, tol_kernel=0.015)
    return selfcheck.run(params, state, data, batch=835, tol_cpu=0.1,
                         tol_kernel=0.015)


def train_bench() -> dict:
    """Time real epochs of all three stage trainers (auditable counterpart
    of docs/PERFORMANCE.md's training-throughput prose).

    Each stage runs ``EPOCHS`` full epochs (668 train windows + 167 eval
    windows, batch 20, device-resident data) from its normal entry point;
    the first epoch absorbs compiles and is discarded, the MEDIAN of the
    rest is reported (round-3 used min-of-2, which inherited the tunnel's
    per-epoch fetch jitter -- a median over more epochs is stable across
    consecutive runs; the min rides along per stage for best-case context).
    """
    import statistics

    from mmego_tpu.config import Config
    from mmego_tpu.train import loop

    EPOCHS = 10   # median over 9 steady epochs; epochs are ~0.4 s on TPU
    stages = {}
    for name, fn, idx in (("imu", loop.train_imu, 9801),
                          ("upper", loop.train_upper, 9802),
                          ("lower", loop.train_lower, 9803)):
        times = []
        cfg = Config(idx=idx, save_best=False)
        fn(cfg, verbose=False, max_epochs=EPOCHS, timings=times)
        steady = times[1:] or times[-1:]  # early stop can end a stage at 1
        stages[f"{name}_s"] = round(statistics.median(steady), 3)
        stages[f"{name}_min_s"] = round(min(steady), 3)
    return stages


def main(argv):
    # The tunnel to the TPU chip can be down for hours; without this guard
    # the first backend init would hang uninterruptibly in the PJRT plugin
    # and the driver would record nothing at all.  On fallback the published
    # line is annotated so a CPU number is never mistaken for a TPU one.
    from mmego_tpu.utils.platform import ensure_reachable_backend

    platform, reason = ensure_reachable_backend()
    fallback = {} if platform != "cpu" else {
        "platform": "cpu",
        "note": ("accelerator backend unreachable; CPU fallback numbers"
                 if reason == "unreachable" else
                 "CPU run (%s); not an accelerator result" % reason)}

    if "--train" in argv and fallback:
        # 9 CPU epochs would grind for an hour before printing anything --
        # emit an honest line immediately (before the ~3 min CPU selfcheck).
        print(json.dumps({
            "metric": "train_epoch_time_all_stages", "value": 0.0,
            "unit": "s", "vs_baseline": 0.0, **fallback,
            "error": "train bench skipped on CPU (minutes per epoch)"}))
        return 1

    from mmego_tpu.config import demo_config
    from mmego_tpu import infer
    from mmego_tpu.data import dataset as dataset_mod

    cfg = demo_config()
    data = dataset_mod.load_split(cfg, "vis")
    params, state, trained_imu = _load_params(cfg)

    if not _selfcheck(params, state, data, full=not fallback):
        print(json.dumps({"metric": "cascade_inference_throughput",
                          "value": 0.0, "unit": "it/s", "vs_baseline": 0.0,
                          "error": "backend selfcheck failed"}))
        return 1

    if "--train" in argv:
        stages = train_bench()
        total = round(sum(v for k, v in stages.items()
                          if not k.endswith("_min_s")), 3)
        print(json.dumps({
            "metric": "train_epoch_time_all_stages",
            "value": total,
            "unit": "s (sum of one epoch per stage: train+eval, 835 windows)",
            "vs_baseline": round(3 * BASELINE_EPOCH_S / total, 2),
            "stages": stages,
            **fallback,
        }))
        return 0

    # sweep device batch sizes, best-of-5 timed passes each (steady-state
    # throughput; compile excluded by the warmup inside evaluate()).  Five
    # passes because the tunneled backend sporadically stalls a host fetch
    # for seconds-to-minutes (docs/PERFORMANCE.md) -- best-of absorbs the
    # outliers; each pass is ~0.1 s of device time.
    import statistics

    best = None
    rates = {}  # batch -> list of per-pass it/s (for the median field)
    # CPU fallback: ONE timed pass at batch 167 with a first-batch-only
    # compile warmup (a full CPU pass is ~3 min; the best-of-5 x 2-batch
    # sweep only matters for tunnel-jitter absorption).
    for batch in ((167,) if fallback else (167, 835)):
        for _ in range(1 if fallback else 5):
            m = infer.evaluate(cfg, data=data, params=params, state=state,
                               verbose=False, batch=batch,
                               return_preds=False,
                               full_warmup=not fallback)
            m["batch"] = batch
            rates.setdefault(batch, []).append(m["it_per_s"])
            if best is None or m["it_per_s"] > best["it_per_s"]:
                best = m

    result = {
        "metric": "cascade_inference_throughput",
        "value": round(best["it_per_s"], 2),
        "unit": "it/s",
        "vs_baseline": round(best["it_per_s"] / BASELINE_IT_S, 2),
        # median of the winning batch's passes: the reproducible companion
        # to the best-of headline (two consecutive runs should agree on it
        # within ~5% even when the tunnel stalls an outlier pass)
        "median_it_s": round(statistics.median(rates[best["batch"]]), 2),
        **fallback,
    }
    print(json.dumps(result))
    # context for humans on stderr (driver reads stdout's single line)
    print(f"windows={best['windows']} elapsed={best['elapsed_s']:.3f}s "
          f"avg_err={best['avg_cm']:.3f}cm (trained_imu={trained_imu}) "
          f"upper={best['upper_cm']:.3f} lower={best['lower_cm']:.3f} "
          f"rot={best['rot_deg']:.3f}deg", file=sys.stderr)
    # training-throughput line rides on stderr so the driver's tail records
    # it while stdout stays a single parseable line.
    if fallback:
        print("train bench skipped on CPU fallback (minutes per epoch)",
              file=sys.stderr)
        return 0
    try:
        stages = train_bench()
        total = round(sum(v for k, v in stages.items()
                          if not k.endswith("_min_s")), 3)
        print(json.dumps({
            "metric": "train_epoch_time_all_stages", "value": total,
            "unit": "s (sum of one epoch per stage: train+eval, 835 windows)",
            "vs_baseline": round(3 * BASELINE_EPOCH_S / total, 2),
            "stages": stages}), file=sys.stderr)
    except Exception as e:  # never corrupt the published inference line
        print(f"train bench failed: {e!r}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
