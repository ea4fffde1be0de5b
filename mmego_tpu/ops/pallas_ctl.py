"""Central switch for the hand-written Pallas TPU kernels.

Kernel use is decided at TRACE time, so a single process can jit the same
model both ways (e.g. the benchmark's CPU cross-check traces a scan-only
program with ``backend='cpu'`` while the TPU program uses the kernels).

CAVEAT: the ambient switch is NOT part of any jit cache key.  A program
jitted while kernels were on is reused verbatim by later same-shape calls
even inside an ``override(False)`` block.  Jitted entry points that must be
shared across switch states (the inference cascade, ``infer.py``) close the
trap structurally: they take a :func:`snapshot` of the resolution as a
STATIC jit argument and re-impose it with :func:`snapshot_scope` inside the
traced body, so the switch becomes part of the jit cache key.  Everywhere
else, construct a FRESH ``jax.jit`` per setting (as
``utils/selfcheck.cpu_crosscheck`` does) or call ``jax.clear_caches()``
between settings.

Resolution order:
  1. an active ``override(...)`` context (tests force-enable with interpret
     mode; the CPU cross-check force-disables),
  2. the per-op ``MMEGO_PALLAS_<OP>`` env var ("1"/"0" -- A/B a single op),
  3. the ``MMEGO_PALLAS`` env var ("1"/"0" -- applies to every op),
  3b. an active ``default_override(...)`` context (replaces the per-op
     defaults without beating an explicit user env setting; the TP trainers
     scope kernels off with it),
  4. per-op default.  ``lstm`` (ops/pallas_lstm.fused_stack) is ON for a real
     TPU backend: measured 1.56x over the XLA scan on the dominant stage.
     ``attn``/``gcn`` are OFF: their ops are bandwidth-trivial at this
     model's shapes and XLA's fusion already runs them at speed of light;
     the kernels exist (and are parity-tested) for shapes where pooling /
     graph contraction dominate.  Mosaic kernels cannot lower for the CPU
     backend, so everything is off when the default backend is not a TPU.
"""

from __future__ import annotations

import contextlib
import contextvars
import os

# Context-local (not a module global): concurrent tracing from another thread
# (async compile, parallel tests) inside an ``override(...)`` block must not
# flip kernel selection for unrelated traces.
_OVERRIDE: contextvars.ContextVar[tuple] = contextvars.ContextVar(
    "mmego_pallas_override", default=())

_OP_DEFAULT_ON = {"lstm": True, "attn": False, "gcn": False, "tcn": False,
                  "xattn": False}

# Weaker than env vars: a scope that replaces the built-in per-op defaults
# (resolution step 4) without overriding an explicit user setting.  The TP
# trainers use it to default kernels off while tracing GSPMD-sharded steps
# (Pallas calls are opaque to the partitioner) -- scoped, unlike the old
# ``os.environ.setdefault("MMEGO_PALLAS", "0")``, which leaked the off
# default into later single-device inference in the same process.
_DEFAULT_OVERRIDE: contextvars.ContextVar[tuple] = contextvars.ContextVar(
    "mmego_pallas_default_override", default=())


# Highest-priority resolution: an exact per-op decision re-imposed inside a
# jitted body from a static-argument snapshot (see snapshot()/snapshot_scope).
_SNAPSHOT: contextvars.ContextVar[tuple] = contextvars.ContextVar(
    "mmego_pallas_snapshot", default=())


def enabled(op: str = "lstm") -> bool:
    snaps = _SNAPSHOT.get()
    if snaps:
        return dict(snaps[-1]).get(op, False)
    stack = _OVERRIDE.get()
    if stack:
        return stack[-1]
    import jax
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False
    env_op = os.environ.get(f"MMEGO_PALLAS_{op.upper()}")
    if env_op is not None:            # per-op A/B switch, e.g. MMEGO_PALLAS_TCN
        return env_op == "1" and on_tpu
    env = os.environ.get("MMEGO_PALLAS")
    if env is not None:
        return env == "1" and on_tpu
    dstack = _DEFAULT_OVERRIDE.get()
    if dstack:
        return dstack[-1] and on_tpu
    return on_tpu and _OP_DEFAULT_ON.get(op, False)


@contextlib.contextmanager
def override(value: bool):
    token = _OVERRIDE.set(_OVERRIDE.get() + (bool(value),))
    try:
        yield
    finally:
        _OVERRIDE.reset(token)


def snapshot(force_off: bool = False) -> tuple:
    """Hashable resolution of every op's switch under the current
    context/env: sorted ``(op, enabled)`` pairs.

    Pass the result as a STATIC jit argument and re-impose it with
    :func:`snapshot_scope` inside the jitted body -- the kernel choice then
    participates in the jit cache key, so one shared jit binding serves
    kernels-on and kernels-off callers (mesh vs single-device) without ever
    reusing the wrong jaxpr.  ``force_off=True`` resolves with the per-op
    defaults replaced by off (the mesh rule: Pallas calls are opaque to the
    GSPMD partitioner) while still letting an explicit user env setting win,
    per the module resolution order.
    """
    ctx = default_override(False) if force_off else contextlib.nullcontext()
    with ctx:
        return tuple((op, enabled(op)) for op in sorted(_OP_DEFAULT_ON))


def mesh_snapshot() -> tuple:
    """The snapshot a GSPMD-sharded (mesh) trace should run under: per-op
    defaults forced off (Pallas calls are opaque to the partitioner), an
    explicit user env setting still winning -- with a loud warning when it
    does, since the sharding then buys nothing for the kernel ops.  The ONE
    implementation of the mesh kernel policy (used by infer.evaluate and
    train.loop._tp_scoped)."""
    snap = snapshot(force_off=True)
    if any(on for _, on in snap):
        import warnings
        warnings.warn(
            "Pallas kernels are force-enabled by MMEGO_PALLAS[_*] while a "
            "mesh is active; kernel calls are opaque to GSPMD, which will "
            "all-gather their operands and compute them replicated "
            "(correct, but the sharding buys nothing for them). Unset the "
            "env var for mesh runs.")
    return snap


@contextlib.contextmanager
def snapshot_scope(snap: tuple):
    """Impose an exact per-op resolution (a :func:`snapshot` value) for the
    scope; beats every other resolution step (it *is* the resolution the
    caller captured, including any overrides active at capture time)."""
    token = _SNAPSHOT.set(_SNAPSHOT.get() + (tuple(snap),))
    try:
        yield
    finally:
        _SNAPSHOT.reset(token)


@contextlib.contextmanager
def default_override(value: bool):
    """Replace the per-op defaults within the scope; env vars and
    ``override`` still win (see module docstring's resolution order)."""
    token = _DEFAULT_OVERRIDE.set(_DEFAULT_OVERRIDE.get() + (bool(value),))
    try:
        yield
    finally:
        _DEFAULT_OVERRIDE.reset(token)
