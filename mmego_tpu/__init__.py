"""mmEgo-TPU: a TPU-native (JAX/XLA/Pallas) framework for egocentric human
pose estimation from head-mounted mmWave radar + IMU.

From-scratch rebuild of the capabilities of the reference mmEgo system
(three-stage IMU -> upper-body -> lower-body cascade regressing a 21-joint
skeleton), re-architected for TPU: pure-function models over parameter
pytrees, one fused jit-compiled cascade, an HBM-resident data pipeline, and
data-parallel training over a ``jax.sharding.Mesh``.
"""

from mmego_tpu.config import Config, demo_config, DEFAULT

__version__ = "0.1.0"
__all__ = ["Config", "demo_config", "DEFAULT", "__version__"]
