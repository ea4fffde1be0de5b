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


def _default_probe(timeout_s: float) -> bool:
    """Run one tiny device round trip in a CHILD process, bounded.

    The child (not the parent) pays the backend-init risk: when the remote
    tunnel is down, init blocks in a native retry loop that no in-process
    timeout can interrupt, so the only safe probe is a killable subprocess.
    """
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp, numpy;"
            "numpy.asarray((jnp.ones((8, 8)) @ jnp.ones((8, 8)))"
            ".block_until_ready())")
    try:
        return subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        ).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def ensure_reachable_backend(timeout_s: float = 120.0, probe=None) -> str:
    """Fall back to CPU when the ambient accelerator backend is unreachable.

    The deployment tunnel to the TPU chip sporadically goes down for hours;
    a process that then touches any JAX API hangs forever inside the PJRT
    plugin's reconnect loop (uninterruptible -- the sleep lives in native
    code).  Call this at entry of must-finish processes (``bench.py``)
    BEFORE any backend init:

    * ambient platform already CPU -> no probe, returns ``"cpu"``.
    * probe round trip succeeds within ``timeout_s`` -> returns the ambient
      platform name (normal operation, nothing changed).
    * probe fails/times out -> pins ``jax_platforms`` to CPU in THIS process
      and returns ``"cpu"`` so callers can annotate published numbers.

    ``probe`` is injectable for tests; the default runs one tiny device
    round trip in a killable subprocess (see :func:`_default_probe`).
    The reference has no analogue (local CUDA; no tunnel to lose).
    """
    ambient = os.environ.get("JAX_PLATFORMS", "")
    if ambient == "cpu":
        return "cpu"
    if (probe or _default_probe)(timeout_s):
        return ambient or "default"
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backends already up in-process; caller got there first
    return "cpu"
