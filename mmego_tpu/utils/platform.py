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
