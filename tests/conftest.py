"""Test configuration: force an 8-device virtual CPU mesh.

The ambient environment pre-imports JAX and registers a real-TPU PJRT plugin
(JAX_PLATFORMS=axon) from sitecustomize, so env vars alone are too late --
``jax.config.update`` must be used before any backend is initialised.  Tests
run on CPU both for speed (no remote compile round-trips) and determinism
(float32 parity tolerances; TPU matmuls default to bf16).  Multi-device
sharding paths are exercised without hardware via
``--xla_force_host_platform_device_count=8``.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    xla_flags = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in xla_flags:
    # O0 codegen: the suite is COMPILE-bound on this 1-core host (a cold
    # run spends ~2/3 of its wall time in LLVM), and at test shapes the
    # unoptimized code is not measurably slower to RUN (A/B on the heaviest
    # trainer test: cold 178s -> 88s, warm 29s -> 23s).  Production TPU
    # paths never see this flag -- it is test-harness-only.
    xla_flags = (xla_flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = xla_flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is compile-bound (big LSTM
# stacks x GSPMD partitioning on a single-core host), and programs are
# identical across runs.  First run populates .cache/jax-test; repeat runs
# skip most XLA work.  min_compile_time 0 is required for the CPU backend
# to persist at all.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".cache", "jax-test")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU; got " + str(jax.devices()[0]))
assert jax.device_count() == 8, "expected an 8-device virtual CPU mesh"
