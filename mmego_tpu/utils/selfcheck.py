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

import sys
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


def _cpu_reference_outputs(params, state, sub, lower_pc_no, imu_used):
    """Cascade outputs for the probe windows on the host CPU backend.

    In-process when the CPU backend is registered (tests, fallback runs).
    Under the deployment env's ``JAX_PLATFORMS=axon`` the CPU backend
    CANNOT be registered in this process (the axon shim hangs backend init
    for any other platform list), so the reference is recomputed in a
    ``JAX_PLATFORMS=cpu`` child via utils/selfcheck_child.py -- one .npz
    out, one back."""
    from mmego_tpu.models import cascade
    from mmego_tpu.ops import pallas_ctl

    host_p = jax.device_get(params)
    host_s = jax.device_get(state)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        import os
        import subprocess
        import tempfile

        from mmego_tpu.checkpoint import store

        repo = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH=os.pathsep.join(
                       [repo, os.environ.get("PYTHONPATH", "")]))
        with tempfile.TemporaryDirectory(prefix="mmego_selfcheck_") as td:
            in_path = os.path.join(td, "in.npz")
            out_path = os.path.join(td, "out.npz")
            store.save(in_path, {
                "params": host_p, "state": host_s,
                "cloud": np.asarray(sub.cloud), "imu": np.asarray(sub.imu),
                "bones": np.asarray(sub.bones)})
            subprocess.run(
                [sys.executable, "-m", "mmego_tpu.utils.selfcheck_child",
                 in_path, out_path, str(lower_pc_no),
                 "1" if imu_used else "0"],
                env=env, check=True, timeout=600.0, cwd=repo)
            with np.load(out_path) as d:
                return {k: d[k] for k in ("upper", "lower", "all")}

    p_cpu, s_cpu = jax.device_put((host_p, host_s), cpu)
    fn = jax.jit(cascade.cascade_apply, static_argnums=(5, 6), backend="cpu")
    with pallas_ctl.override(False):     # Mosaic kernels cannot lower for CPU
        out = fn(p_cpu, s_cpu,
                 jax.device_put(jnp.asarray(sub.cloud), cpu),
                 jax.device_put(jnp.asarray(sub.imu), cpu),
                 jax.device_put(jnp.asarray(sub.bones), cpu),
                 lower_pc_no, imu_used)
    return {k: np.asarray(v) for k, v in out.items()}


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

    sub = data.take(slice(0, probe))
    dev_probe = infer.run_cascade_batched(params, state, sub, probe,
                                          lower_pc_no, imu_used)
    out = _cpu_reference_outputs(params, state, sub, lower_pc_no, imu_used)
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


def kernel_crosscheck(params, state, data, probe: int = 8,
                      lower_pc_no: int = 64,
                      imu_used: bool = True) -> Optional[Dict]:
    """Max deviation of the Pallas-kernel path from the lax.scan path on the
    SAME backend, same probe windows.

    This isolates exactly what a kernel edit can change: ambient backend
    noise (matmul reduction order, XLA's bf16 operand rounding at default
    precision) is common to both traces and cancels, so a regression here is
    attributable to ops/pallas_*.py, not to weight sharpness or the backend.
    (The CPU cross-check can NOT make that attribution: measured on the
    round-3 chain-5 weights, its 3.6e-2 m max deviation persists unchanged
    with kernels off and MMEGO_LSTM_PRECISION=highest -- it is chaotic
    amplification of cross-backend f32/bf16 ambient differences through the
    20-step recurrences, and grows as training sharpens the weights.)

    Measured (round-3 chain-5 weights): max 6-9e-3 m across jit bindings
    (lower stage dominates; upper ~2e-3), probe-metric delta <=0.001 cm.

    Returns None (skipped) when the default backend is not a TPU -- the
    Mosaic kernels only lower there; interpret-mode parity is covered by
    tests/test_pallas_lstm.py.
    """
    from mmego_tpu.models import cascade
    from mmego_tpu.ops import pallas_ctl

    if jax.default_backend() != "tpu":
        return None
    sub = data.take(slice(0, probe))
    args = (jnp.asarray(sub.cloud), jnp.asarray(sub.imu),
            jnp.asarray(sub.bones))
    outs = []
    for on in (True, False):
        # Fresh lambda per setting: the pallas_ctl switch is trace-time and
        # not a jit cache key, and jax's jaxpr cache is keyed on the wrapped
        # callable -- reusing one callable would silently reuse one trace.
        fn = jax.jit(lambda p, s, c, i, b: cascade.cascade_apply(
            p, s, c, i, b, lower_pc_no, imu_used))
        with pallas_ctl.override(on):
            outs.append({k: np.asarray(v)
                         for k, v in fn(params, state, *args).items()})
    kern, scan = outs
    dev = {k: float(np.abs(kern[k] - scan[k]).max())
           for k in ("upper", "lower", "all")}
    dev["max"] = max(dev.values())
    gt = np.asarray(sub.key)
    mean_cm = lambda pred: float(
        np.sqrt(np.sum((np.asarray(pred, np.float64) - gt) ** 2,
                       axis=-1)).mean() * 100.0)
    dev["metric_delta_cm"] = abs(mean_cm(kern["all"]) - mean_cm(scan["all"]))
    return dev


def run(params, state, data, batch: int, lower_pc_no: int = 64,
        imu_used: bool = True, tol_batch: float = 1e-2,
        tol_cpu: Optional[float] = None,
        tol_metric_cm: float = 0.05,
        tol_kernel: Optional[float] = None,
        verbose: bool = True) -> bool:
    """Full self-check; returns True when the backend passes.

    tol_batch: allowed batch-invariance violation in metres.  Measured
    decomposition (2026-08-17, round-3 weights): scan path 1.5 mm (XLA
    retiles the conv/matmul reductions across batch sizes), fused bf16 LSTM
    kernel path 5.8 mm (block-boundary rounding through the 20-step
    recurrence; grows with weight sharpness), observed miscompiles >0.9 m.
    1 cm sits ~1.7x above today's legal noise and ~100x below the failure
    signature; absolute accuracy is independently bounded by the CPU
    cross-check + metric-gap gates below.
    tol_cpu: allowed TPU-vs-CPU max per-joint deviation in metres.  This is
    a MISCOMPILE detector, not a kernel-accuracy gate: the legal deviation
    is ambient cross-backend noise amplified by the recurrences (weight-
    sharpness dependent; 1.9e-2 m on round-2 weights, 3.6e-2 m on round-3
    chain-5 weights, unchanged with kernels off at highest precision), while
    observed miscompiles exceed 0.9 m.  Semantic accuracy is gated by
    tol_metric_cm; kernel-edit regressions by tol_kernel.
    tol_metric_cm (applies with tol_cpu): allowed |probe-set mean joint
    error| gap between the TPU and CPU paths (measured: 0.033 cm).
    tol_kernel: allowed kernel-vs-scan max deviation in metres on the same
    backend (the budget a Pallas kernel edit may spend; measured 9.1e-3 m).
    The kernel metric gap shares tol_metric_cm (measured: 0.0009 cm).
    Skipped silently off-TPU.
    """
    bi = batch_invariance(params, state, data, batch,
                          lower_pc_no=lower_pc_no, imu_used=imu_used)
    ok = bi["max"] <= tol_batch
    if verbose:
        status = "ok" if ok else "VIOLATION"
        print(f"[selfcheck] batch-invariance max dev {bi['max']:.2e} m "
              f"(tol {tol_batch:.0e}) -> {status}", file=sys.stderr)
    if tol_kernel is not None:
        kc = kernel_crosscheck(params, state, data,
                               lower_pc_no=lower_pc_no, imu_used=imu_used)
        if kc is not None:
            kern_ok = (kc["max"] <= tol_kernel
                       and kc["metric_delta_cm"] <= tol_metric_cm)
            if verbose:
                status = "ok" if kern_ok else "VIOLATION"
                print(f"[selfcheck] kernel-vs-scan max dev {kc['max']:.2e} m "
                      f"(tol {tol_kernel:.0e}), metric gap "
                      f"{kc['metric_delta_cm']:.4f} cm (tol {tol_metric_cm}) "
                      f"-> {status}", file=sys.stderr)
            ok = ok and kern_ok
        elif verbose:
            print("[selfcheck] kernel-vs-scan skipped (backend is not tpu)",
                  file=sys.stderr)
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
                  f"-> {status}", file=sys.stderr)
        ok = ok and cpu_ok
    return ok
