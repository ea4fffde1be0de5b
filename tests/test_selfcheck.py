import numpy as np
import jax

from mmego_tpu.models import cascade
from mmego_tpu.utils import selfcheck


from _helpers import tiny_windows


def _tiny(rng, n=8):
    return tiny_windows(rng, n)


def test_selfcheck_passes_on_cpu():
    rng = np.random.RandomState(0)
    data = _tiny(rng)
    params, state = cascade.cascade_init(jax.random.PRNGKey(0))
    assert selfcheck.run(params, state, data, batch=8, lower_pc_no=8,
                         tol_cpu=1e-4, verbose=False)


def test_batch_invariance_reports_deviation():
    rng = np.random.RandomState(1)
    data = _tiny(rng)
    params, state = cascade.cascade_init(jax.random.PRNGKey(1))
    dev = selfcheck.batch_invariance(params, state, data, batch=8, probe=4,
                                     lower_pc_no=8)
    assert set(dev) == {"upper", "lower", "all", "max"}
    assert dev["max"] < 1e-4  # CPU backend: per-window math is batch-stable


def test_cpu_crosscheck_metric_gap_field():
    """The bf16-vs-f32 demo-metric gap gate (VERDICT r2 item 5): the
    crosscheck must report metric_delta_cm, it must be ~0 when both paths run
    on the same backend, and run() must fail when the gap budget is 0 but a
    deviation exists."""
    rng = np.random.RandomState(2)
    data = _tiny(rng)
    params, state = cascade.cascade_init(jax.random.PRNGKey(2))
    cc = selfcheck.cpu_crosscheck(params, state, data, probe=4,
                                  lower_pc_no=8)
    assert "metric_delta_cm" in cc
    assert cc["metric_delta_cm"] < 1e-4        # CPU-vs-CPU: no bf16 gap

    # Simulate a kernel edit that shifts the device path's numerics: bias
    # every "device" output by 1 mm (below any per-element tolerance worth
    # gating on raw deviation alone at 1e9) and require run() to reject it
    # through the METRIC gate.
    import mmego_tpu.utils.selfcheck as sc
    real = sc.cpu_crosscheck

    def biased_crosscheck(*a, **kw):
        out = real(*a, **kw)
        out["metric_delta_cm"] = out["metric_delta_cm"] + 0.1
        return out

    sc_run_kwargs = dict(batch=8, lower_pc_no=8, tol_cpu=1e9, verbose=False)
    try:
        sc.cpu_crosscheck = biased_crosscheck
        assert not sc.run(params, state, data, tol_metric_cm=0.05,
                          **sc_run_kwargs)
        assert sc.run(params, state, data, tol_metric_cm=0.2,
                      **sc_run_kwargs)
    finally:
        sc.cpu_crosscheck = real


def test_cpu_crosscheck_child_process_fallback(monkeypatch):
    """Under the deployment env (JAX_PLATFORMS=axon) the in-process CPU
    backend does not exist -- jax.devices("cpu") raises -- and the CPU
    reference must be recomputed in a JAX_PLATFORMS=cpu child process
    (utils/selfcheck_child.py).  Here both sides are CPU, so the child's
    outputs must agree with the in-process path to float-reduction noise."""
    rng = np.random.RandomState(4)
    data = _tiny(rng, n=4)
    params, state = cascade.cascade_init(jax.random.PRNGKey(4))

    orig = jax.devices

    def no_cpu_backend(platform=None):
        if platform == "cpu":
            raise RuntimeError("Unknown backend cpu (simulated axon env)")
        return orig(platform)

    monkeypatch.setattr(jax, "devices", no_cpu_backend)
    cc = selfcheck.cpu_crosscheck(params, state, data, probe=4,
                                  lower_pc_no=8)
    assert cc["max"] < 1e-4
    assert cc["metric_delta_cm"] < 1e-4


def test_kernel_crosscheck_gate():
    """kernel_crosscheck isolates kernel-edit regressions: it is skipped
    (None) off-TPU, and run() must fail when an injected kernel deviation
    exceeds tol_kernel while everything else passes."""
    rng = np.random.RandomState(3)
    data = _tiny(rng)
    params, state = cascade.cascade_init(jax.random.PRNGKey(3))

    assert jax.default_backend() != "tpu"       # test env pins CPU
    assert selfcheck.kernel_crosscheck(params, state, data,
                                       lower_pc_no=8) is None
    # Off-TPU the gate must not block a passing run (skip, not fail).
    assert selfcheck.run(params, state, data, batch=8, lower_pc_no=8,
                         tol_kernel=1e-9, verbose=False)

    import mmego_tpu.utils.selfcheck as sc
    real = sc.kernel_crosscheck
    try:
        sc.kernel_crosscheck = lambda *a, **kw: {
            "upper": 0.02, "lower": 0.0, "all": 0.02, "max": 0.02,
            "metric_delta_cm": 0.0}
        common = dict(batch=8, lower_pc_no=8, verbose=False)
        assert not sc.run(params, state, data, tol_kernel=0.015, **common)
        assert sc.run(params, state, data, tol_kernel=0.05, **common)
        # the metric gap budget is shared with the CPU gate
        sc.kernel_crosscheck = lambda *a, **kw: {
            "upper": 0.0, "lower": 0.0, "all": 0.0, "max": 0.0,
            "metric_delta_cm": 0.1}
        assert not sc.run(params, state, data, tol_kernel=0.015, **common)
    finally:
        sc.kernel_crosscheck = real
