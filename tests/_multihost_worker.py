"""Worker for the REAL two-process multi-host tests.

Launched twice by ``tests/test_multihost.py`` (process 0 and 1).  Each
process exposes 2 virtual CPU devices, joins the cluster through the real
``jax.distributed.initialize`` path (via ``parallel.mesh.init_multihost`` --
no monkeypatching), builds the global 4-device data mesh with ``make_mesh``,
and then:

1. runs a jitted global reduction over an array whose shards live in
   different processes -- forcing XLA to insert a genuine cross-process
   collective (the CPU analogue of the DCN/ICI collectives on a TPU slice);
   prints ``MULTIHOST_OK <global_sum>``;
2. (mode ``trainer``) runs a REAL ``train.loop.train_upper`` epoch and a
   REAL ``infer.evaluate`` across both processes (batches fed through
   ``mesh.put_global`` -> ``make_array_from_callback``) and verifies both
   match the single-process run numerically -- the multi-controller
   equivalent of tests/test_sharding.py's DP-vs-single-device bar; prints
   ``MULTIHOST_TRAIN_OK <max_param_dev>`` and ``MULTIHOST_EVAL_OK
   <avg_cm_dev>``.
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

    if len(sys.argv) > 3 and sys.argv[3] == "trainer":
        _trainer_phase(proc_id)
    return 0


def _trainer_phase(proc_id: int) -> None:
    """A real stage-2 epoch + a real evaluate() across the two processes,
    each checked for numeric equivalence against the single-process run
    (MMEGO_DP=off -> mesh None -> purely process-local compute; both
    processes run the reference redundantly, which also keeps them in
    lockstep for the collective phases)."""
    import tempfile

    import jax
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _helpers import tiny_windows
    from mmego_tpu import infer
    from mmego_tpu.checkpoint import store
    from mmego_tpu.config import Config
    from mmego_tpu.models import cascade, imu_net
    from mmego_tpu.train import loop

    tmp = tempfile.mkdtemp(prefix=f"mmego_mh_p{proc_id}_")

    # Deterministic tiny world: both processes build identical data/params.
    rng = np.random.RandomState(3)
    data = {"train": tiny_windows(rng, 16), "test": tiny_windows(rng, 8)}
    loop.dataset_mod.load_split = lambda c, split: data[split]
    orig_init = imu_net.imu_net_init
    imu_net.imu_net_init = lambda r, **kw: orig_init(r, hidden=16)
    imu_path = os.path.join(tmp, "imu.npz")
    store.save(imu_path, imu_net.imu_net_init(jax.random.PRNGKey(0)))

    def cfg_for(idx):
        return Config(idx=idx, frame_no=4, pc_no=16, lower_pc_no=8,
                      batch_size=8, early_stop_patience=100, save_slot=100,
                      report_root=os.path.join(tmp, "runs"),
                      model_imu_path=imu_path,
                      model_upper_path=os.path.join(tmp, "upper.npz"),
                      model_lower_path=os.path.join(tmp, "lower.npz"))

    # Single-process reference (mesh None; identical in both processes) ...
    os.environ["MMEGO_DP"] = "off"
    (p_ref, _), _ = loop.train_upper(cfg_for(70), max_epochs=1, verbose=False)
    # ... vs the same epoch trained over the global 4-device 2-process mesh.
    os.environ["MMEGO_DP"] = "auto"
    (p_mh, _), _ = loop.train_upper(cfg_for(71), max_epochs=1, verbose=False)
    devs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            for a, b in zip(jax.tree.leaves(p_mh), jax.tree.leaves(p_ref))]
    assert max(devs) < 2e-4, f"trainer multi-process deviation {max(devs)}"
    print(f"MULTIHOST_TRAIN_OK {max(devs):.3e}", flush=True)

    # evaluate(): metrics across processes == single-process metrics.
    eval_data = tiny_windows(np.random.RandomState(5), 10, with_r_rtw=True)
    params, state = cascade.cascade_init(jax.random.PRNGKey(0))
    cfg = cfg_for(72).replace(infer_batch=4)
    os.environ["MMEGO_DP"] = "off"
    m_ref = infer.evaluate(cfg, data=eval_data, params=params, state=state,
                           verbose=False, time_it=False)
    os.environ["MMEGO_DP"] = "auto"
    m_mh = infer.evaluate(cfg, data=eval_data, params=params, state=state,
                          verbose=False, time_it=False)
    devs = [abs(m_mh[k] - m_ref[k]) / max(abs(m_ref[k]), 1e-9)
            for k in ("avg_cm", "upper_cm", "lower_cm", "rot_deg")]
    assert max(devs) < 1e-5, f"evaluate multi-process deviation {devs}"
    print(f"MULTIHOST_EVAL_OK {max(devs):.3e}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
