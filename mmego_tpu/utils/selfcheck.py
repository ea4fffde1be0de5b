"""Backend numerics self-check: detect silent accelerator miscompiles.

The cascade is mathematically batch-invariant (every window is processed
independently), which yields a free invariant to audit the compiler/runtime
against: the same windows pushed through the jitted program at two different
batch sizes must produce (near-)identical outputs.  A tunneled TPU backend
was observed violating this badly (jnp.flip on multi-GB tensors corrupted
values; see nn/lstm.py), so the benchmark and CI run this check rather than
trusting the hardware.

An optional CPU cross-check re-runs a few windows on the host backend (the
ground truth the unit/parity tests are anchored to) and reports the deviation
-- this bounds accumulated low-precision error, not just batch variance.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp


def batch_invariance(params, state, data, batch: int, probe: int = 16,
                     lower_pc_no: int = 64, imu_used: bool = True) -> Dict:
    """Max |output(batch=batch) - output(batch=probe)| over the probe windows."""
    from mmego_tpu import infer

    big = infer.run_cascade_batched(params, state, data.take(slice(0, batch)),
                                    batch, lower_pc_no, imu_used)
    small = infer.run_cascade_batched(params, state, data.take(slice(0, probe)),
                                      probe, lower_pc_no, imu_used)
    dev = {k: float(np.abs(big[k][:probe] - small[k]).max())
           for k in ("upper", "lower", "all")}
    dev["max"] = max(dev.values())
    return dev


def cpu_crosscheck(params, state, data, probe: int = 8,
                   lower_pc_no: int = 64, imu_used: bool = True) -> Dict:
    """Max deviation of TPU outputs from the CPU backend on probe windows.

    Also reports ``metric_delta_cm``: the |difference| of the probe-set mean
    joint error between the two backends.  The CPU path traces with Pallas
    kernels disabled and runs full-f32 math, so this IS the bf16-kernel-vs-
    f32-scan demo-metric gap (measured once at 0.002 cm, nn/lstm.py:30-36)
    -- gating on it keeps future kernel edits from silently trading accuracy
    for speed."""
    from mmego_tpu import infer
    from mmego_tpu.models import cascade

    sub = data.take(slice(0, probe))
    dev_probe = infer.run_cascade_batched(params, state, sub, probe,
                                          lower_pc_no, imu_used)

    cpu = jax.devices("cpu")[0]
    host_p = jax.device_get(params)
    host_s = jax.device_get(state)
    p_cpu, s_cpu = jax.device_put((host_p, host_s), cpu)
    fn = jax.jit(cascade.cascade_apply, static_argnums=(5, 6), backend="cpu")
    from mmego_tpu.ops import pallas_ctl
    with pallas_ctl.override(False):     # Mosaic kernels cannot lower for CPU
        out = fn(p_cpu, s_cpu,
                 jax.device_put(jnp.asarray(sub.cloud), cpu),
                 jax.device_put(jnp.asarray(sub.imu), cpu),
                 jax.device_put(jnp.asarray(sub.bones), cpu),
                 lower_pc_no, imu_used)
    dev = {k: float(np.abs(dev_probe[k] - np.asarray(out[k])).max())
           for k in ("upper", "lower", "all")}
    dev["max"] = max(dev.values())
    gt = np.asarray(sub.key)                               # (W, L, 21, 3)
    mean_cm = lambda pred: float(
        np.sqrt(np.sum((np.asarray(pred, np.float64) - gt) ** 2,
                       axis=-1)).mean() * 100.0)
    dev["metric_delta_cm"] = abs(mean_cm(dev_probe["all"])
                                 - mean_cm(out["all"]))
    return dev


def run(params, state, data, batch: int, lower_pc_no: int = 64,
        imu_used: bool = True, tol_batch: float = 1e-2,
        tol_cpu: Optional[float] = None,
        tol_metric_cm: float = 0.05, verbose: bool = True) -> bool:
    """Full self-check; returns True when the backend passes.

    tol_batch: allowed batch-invariance violation in metres.  Measured
    decomposition (2026-08-17, round-3 weights): scan path 1.5 mm (XLA
    retiles the conv/matmul reductions across batch sizes), fused bf16 LSTM
    kernel path 5.8 mm (block-boundary rounding through the 20-step
    recurrence; grows with weight sharpness), observed miscompiles >0.9 m.
    1 cm sits ~1.7x above today's legal noise and ~100x below the failure
    signature; absolute accuracy is independently bounded by the CPU
    cross-check + metric-gap gates below.
    tol_metric_cm (applies with tol_cpu): allowed |probe-set mean joint
    error| gap between the TPU (bf16 kernels) and CPU (f32 scan) paths --
    the accuracy budget a kernel edit may spend (measured today: ~0.002 cm).
    """
    bi = batch_invariance(params, state, data, batch,
                          lower_pc_no=lower_pc_no, imu_used=imu_used)
    ok = bi["max"] <= tol_batch
    if verbose:
        status = "ok" if ok else "VIOLATION"
        print(f"[selfcheck] batch-invariance max dev {bi['max']:.2e} m "
              f"(tol {tol_batch:.0e}) -> {status}")
    if tol_cpu is not None:
        cc = cpu_crosscheck(params, state, data,
                            lower_pc_no=lower_pc_no, imu_used=imu_used)
        cpu_ok = (cc["max"] <= tol_cpu
                  and cc["metric_delta_cm"] <= tol_metric_cm)
        if verbose:
            status = "ok" if cpu_ok else "VIOLATION"
            print(f"[selfcheck] cpu-crosscheck max dev {cc['max']:.2e} m "
                  f"(tol {tol_cpu:.0e}), metric gap "
                  f"{cc['metric_delta_cm']:.4f} cm (tol {tol_metric_cm}) "
                  f"-> {status}")
        ok = ok and cpu_ok
    return ok
