"""Worker for the REAL two-process multi-host smoke test.

Launched twice by ``tests/test_multihost.py`` (process 0 and 1).  Each
process exposes 2 virtual CPU devices, joins the cluster through the real
``jax.distributed.initialize`` path (via ``parallel.mesh.init_multihost`` --
no monkeypatching), builds the global 4-device data mesh with ``make_mesh``,
and runs a jitted global reduction over an array whose shards live in
different processes -- forcing XLA to insert a genuine cross-process
collective (the CPU analogue of the DCN/ICI collectives on a TPU slice).

Prints ``MULTIHOST_OK <global_sum>`` on success (checked by the test).
"""

import os
import sys


def main() -> int:
    proc_id = int(sys.argv[1])
    coordinator = sys.argv[2]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax  # noqa: E402  (sitecustomize may have pre-imported jax)
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from mmego_tpu.parallel import mesh as mesh_mod

    # The real thing: jax.distributed.initialize with a localhost
    # coordinator (parallel/mesh.py:28-45).
    mesh_mod.init_multihost(coordinator=coordinator, num_processes=2,
                            process_id=proc_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2, jax.local_device_count()
    assert jax.device_count() == 4, jax.device_count()

    # Global mesh spans BOTH processes' devices; each host feeds its own
    # batch shard (the multi-host recipe from parallel/mesh's module doc).
    mesh = mesh_mod.make_mesh()
    assert mesh.devices.size == 4

    n_global = 8
    global_shape = (n_global, 3)
    sharding = NamedSharding(mesh, P(mesh_mod.DATA_AXIS))
    # Each process holds rows [4*pid, 4*pid+4) of the global array.
    local_rows = np.arange(n_global, dtype=np.float32).reshape(-1, 1)
    local_rows = np.repeat(local_rows, 3, axis=1)[4 * proc_id: 4 * proc_id + 4]
    arr = jax.make_array_from_process_local_data(sharding, local_rows,
                                                 global_shape)

    # jitted global reduction: XLA inserts the cross-process collective.
    total = jax.jit(lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P()))(arr)
    got = float(np.asarray(total))
    want = float(np.arange(n_global).sum() * 3)
    assert got == want, (got, want)

    # And one collective through the training-style code path: replicate a
    # "parameter", compute a sharded-batch "gradient" contribution, verify
    # the GSPMD-reduced result matches the full-batch value.
    w = mesh_mod.replicate(mesh, jnp.ones((3,), jnp.float32))
    grad = jax.jit(
        lambda w, x: jax.grad(lambda w: jnp.sum((x @ w) ** 2))(w),
        out_shardings=NamedSharding(mesh, P()))(w, arr)
    got_g = np.asarray(grad)
    full = np.repeat(np.arange(n_global, dtype=np.float32).reshape(-1, 1),
                     3, axis=1)
    want_g = 2.0 * full.T @ (full @ np.ones(3, np.float32))
    np.testing.assert_allclose(got_g, want_g, rtol=1e-6)

    print(f"MULTIHOST_OK {got}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
