"""mmEgo-TPU: a TPU-native (JAX/XLA/Pallas) framework for egocentric human
pose estimation from head-mounted mmWave radar + IMU.

From-scratch rebuild of the capabilities of the reference mmEgo system
(three-stage IMU -> upper-body -> lower-body cascade regressing a 21-joint
skeleton), re-architected for TPU: pure-function models over parameter
pytrees, one fused jit-compiled cascade, an HBM-resident data pipeline, and
data-parallel training over a ``jax.sharding.Mesh``.
"""

import os as _os


def _enable_compile_cache():
    """Persistent XLA/Mosaic compilation cache for every entry point.

    Cold-compiling the fused cascade (incl. the Pallas LSTM kernels) costs
    minutes through the tunneled TPU backend; the programs are identical
    across processes.  Opt out with MMEGO_COMPILE_CACHE=0 or point the dir
    elsewhere with MMEGO_COMPILE_CACHE_DIR.  (tests/conftest.py sets its own
    dir first; jax ignores later updates only if a cache was already used,
    so this is a no-op there.)
    """
    if _os.environ.get("MMEGO_COMPILE_CACHE", "1") != "1":
        return
    import jax

    try:
        if jax.config.jax_compilation_cache_dir:
            # the embedding application (e.g. tests/conftest.py) already
            # configured a cache -- its dir AND thresholds win; overriding
            # here would silently un-persist its entries
            return
        path = _os.environ.get(
            "MMEGO_COMPILE_CACHE_DIR",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".cache", "jax"))
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knobs: cache is an optimisation only


_enable_compile_cache()

# Honor JAX_PLATFORMS for EVERY entry point (scripts, tests, embedders):
# the deployment env pre-registers a remote-TPU PJRT plugin via
# sitecustomize, and once that happened the env var alone no longer keeps
# the first jax.devices() off the (possibly unreachable) tunnel -- only a
# config update issued before backend init does.  No-op when the var is
# unset or a backend is already up (utils/platform.py).
from mmego_tpu.utils.platform import honor_jax_platforms_env as _honor

_honor()

from mmego_tpu.config import Config, demo_config, DEFAULT

__version__ = "0.1.0"
__all__ = ["Config", "demo_config", "DEFAULT", "__version__"]
