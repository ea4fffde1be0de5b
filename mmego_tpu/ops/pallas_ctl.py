"""Central switch for the hand-written Pallas TPU kernels.

Kernel use is decided at TRACE time, so a single process can jit the same
model both ways (e.g. the benchmark's CPU cross-check traces a scan-only
program with ``backend='cpu'`` while the TPU program uses the kernels).

CAVEAT: the switch is NOT part of any jit cache key.  A program jitted while
kernels were on is reused verbatim by later same-shape calls even inside an
``override(False)`` block.  To compare paths at the same shapes, construct a
FRESH ``jax.jit`` per setting (as ``utils/selfcheck.cpu_crosscheck`` does)
or call ``jax.clear_caches()`` between settings.

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


def enabled(op: str = "lstm") -> bool:
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


@contextlib.contextmanager
def default_override(value: bool):
    """Replace the per-op defaults within the scope; env vars and
    ``override`` still win (see module docstring's resolution order)."""
    token = _DEFAULT_OVERRIDE.set(_DEFAULT_OVERRIDE.get() + (bool(value),))
    try:
        yield
    finally:
        _DEFAULT_OVERRIDE.reset(token)
