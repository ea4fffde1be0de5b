"""Honor ``JAX_PLATFORMS`` before any backend is initialised.

The deployment environment registers a remote-TPU PJRT plugin in every
interpreter via ``sitecustomize``.  Once that plugin is registered, setting
``JAX_PLATFORMS=cpu`` in the environment is NOT enough to keep JAX off the
tunnel: the first ``jax.devices()`` call can still dial the remote backend
(and block indefinitely in a native retry loop if the tunnel is down --
uninterruptible by SIGINT because the sleep lives inside the PJRT ``.so``).
An explicit ``jax.config.update("jax_platforms", ...)`` issued before any
backend init is the reliable opt-out; ``tests/conftest.py`` does the same
for the test suite.

Call :func:`honor_jax_platforms_env` at process entry (CLI ``main``,
standalone scripts) before touching any JAX API that initialises backends.
The reference has no analogue (single-process CUDA,
``/root/reference/Config/config.py:31-34``).
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Pin ``jax_platforms`` config to the ``JAX_PLATFORMS`` env value.

    No-op when the variable is unset (normal TPU operation) or when backends
    are already initialised (config update would raise).
    """
    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plats)
    except RuntimeError:
        # Backends already initialised -- too late to change; the env var
        # was read at that point, so selection already matched it.
        pass


def _default_probe(timeout_s: float):
    """Run one tiny device round trip in a CHILD process, bounded.

    The child (not the parent) pays the backend-init risk: when the remote
    tunnel is down, init blocks in a native retry loop that no in-process
    timeout can interrupt, so the only safe probe is a killable subprocess.
    Returns the platform NAME the round trip actually ran on (reachability
    alone is not enough: on a box with no accelerator plugin JAX silently
    resolves to CPU, which must not be published as an accelerator result),
    or ``None`` on failure/timeout.
    """
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp, numpy;"
            "x = (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready();"
            "numpy.asarray(x); print(jax.devices()[0].platform)")
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    except subprocess.TimeoutExpired:
        return None
    lines = r.stdout.strip().splitlines()
    return lines[-1] if r.returncode == 0 and lines else None


def _pin_cpu() -> None:
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backends already up in-process; selection already happened


def ensure_reachable_backend(timeout_s: float = 240.0, probe=None,
                             retries: int = 1, retry_delay_s: float = 30.0):
    """Fall back to CPU when the ambient accelerator backend is unreachable.

    The deployment tunnel to the TPU chip sporadically goes down for hours;
    a process that then touches any JAX API hangs forever inside the PJRT
    plugin's reconnect loop (uninterruptible -- the sleep lives in native
    code).  Call this at entry of must-finish processes (``bench.py``)
    BEFORE any backend init.  Returns ``(platform, reason)``:

    * ``JAX_PLATFORMS=cpu`` requested -> ``("cpu", "requested")``; the
      config is pinned too (the env var alone does NOT keep the registered
      PJRT plugin from dialing the tunnel -- the hazard this module exists
      for).
    * probe round trip succeeds within ``timeout_s`` -> the platform the
      probe actually ran on and ``"probed"`` (normal operation; also how a
      plugin-less dev box is honestly reported as ``("cpu", "probed")``).
    * probe fails/times out -> retried ``retries`` more times after
      ``retry_delay_s`` each (a transient tunnel blip should not forfeit a
      whole round's accelerator artifact); only after every attempt fails
      is ``jax_platforms`` pinned to CPU in THIS process and
      ``("cpu", "unreachable")`` returned so callers annotate published
      numbers as outage fallback.

    ``timeout_s`` defaults to 240 s because a cold backend init through the
    tunnel measures ~120 s even when healthy (round 4 measurement; the old
    120 s default raced it and lost, costing round 3 its TPU capture).

    ``probe`` is injectable for tests; the default runs one tiny device
    round trip in a killable subprocess (see :func:`_default_probe`).
    The reference has no analogue (local CUDA; no tunnel to lose).
    """
    import time

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        _pin_cpu()
        return "cpu", "requested"
    for attempt in range(1 + max(0, retries)):
        if attempt:
            time.sleep(retry_delay_s)
        got = (probe or _default_probe)(timeout_s)
        if got:
            return got, "probed"
    _pin_cpu()
    return "cpu", "unreachable"
