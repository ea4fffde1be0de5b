"""Device mesh + sharding policy: the distributed layer of the framework.

The reference is single-process, single-device (SURVEY.md §2.9); here
data-parallel scale-out is first-class and TPU-native: a 1-D
``jax.sharding.Mesh`` over a ``data`` axis, batches sharded across it,
parameters replicated, and gradient reduction left to XLA's GSPMD partitioner
(collectives ride ICI; no explicit NCCL-analog layer).  Tensor parallelism
over a second ``model`` axis is available via ``make_mesh(..., model=k)`` +
``place_params`` (policy in parallel/tp.py); nothing in these model sizes
*needs* it on real hardware -- it is a validated scale-out capability, not
the single-chip fast path.

Multi-host note: on a multi-host slice, call ``jax.distributed.initialize()``
before ``make_mesh`` and feed per-host batch shards; the mesh spans all
devices automatically.  This path executes for real (two OS processes, a
localhost coordinator, verified cross-process collectives) in
``tests/test_multihost.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"  # reserved; always size 1 in current configs


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Join a multi-host TPU slice before building the mesh.

    Thin wrapper over ``jax.distributed.initialize`` (auto-detects cluster
    env on Cloud TPU when called with no args).  After this, ``make_mesh``
    spans every device in the slice and each host feeds its own batch shard;
    the collectives ride ICI within a slice and DCN across slices -- no
    further code changes anywhere in the framework.
    """
    import jax.distributed

    kw = {}
    if coordinator is not None:
        kw.update(coordinator_address=coordinator,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              model: int = 1) -> Mesh:
    """Build the device mesh: 1-D ``(data,)``, or 2-D ``(data, model)``
    when ``model > 1`` (tensor parallelism; see parallel/tp.py).

    A request for more devices than exist fails loudly: silently shrinking
    would turn every downstream multi-chip check into a false positive (a
    "1-device 8-device mesh" that prints ok).
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only {len(devs)} "
                f"device(s) are visible ({devs[0].platform} backend); refusing "
                "to build a smaller mesh silently")
        devs = devs[:n_devices]
    if model > 1:
        if len(devs) % model:
            raise ValueError(
                f"cannot fold a model axis of {model} into {len(devs)} "
                "device(s) (not divisible)")
        arr = np.asarray(devs).reshape(len(devs) // model, model)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (window/batch) axis split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(x, sharding: NamedSharding):
    """Place one host/device array with an arbitrary sharding, multi-process
    safe.

    Single-controller (``jax.process_count() == 1``): plain ``device_put``.
    Multi-controller: ``device_put`` of a host array to a sharding that spans
    non-addressable devices raises, so each process contributes only its
    addressable shards via ``jax.make_array_from_callback`` -- every process
    holds the full host value (the framework's datasets are deterministic,
    both processes load identical arrays), and the callback slices out the
    rows each local device owns.  This is what makes the trainers' and
    ``infer.evaluate``'s batch feeding run unchanged across OS processes
    (tests/_multihost_worker.py runs a real two-process stage epoch + eval
    through this path).
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    xnp = np.asarray(x)
    return jax.make_array_from_callback(xnp.shape, sharding,
                                        lambda idx: xnp[idx])


def shard_batch(mesh: Mesh, tree):
    """Place every array in a batch pytree with its leading axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: put_global(x, s), tree)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda x: put_global(x, s), tree)


def place_params(mesh: Mesh, tree):
    """Place a parameter-like pytree for this mesh: replicated on a
    data-only mesh, feature-axis sharded (parallel/tp.py policy) when the
    mesh has a non-trivial ``model`` axis."""
    from . import tp
    if tp.model_axis_size(mesh) > 1:
        return tp.shard_tree(mesh, tree)
    return replicate(mesh, tree)


def pad_leading(x, n: int):
    """Repeat-last-row pad of the leading axis up to length ``n``.

    THE batch-alignment primitive, shared by inference batching, the
    trainers' epoch batching, and DP device-multiple padding: repeating the
    last row keeps padded rows statistically plausible for train-mode
    BatchNorm, and every consumer neutralises them with zero weights at the
    loss/metric level.  Works on host (numpy) and device (jax) arrays.
    """
    cur = x.shape[0]
    if cur >= n:
        return x
    xp = jnp if isinstance(x, jax.Array) else np
    return xp.concatenate([x, xp.repeat(x[-1:], n - cur, axis=0)], axis=0)


def pad_to_multiple(x: np.ndarray, multiple: int):
    """Pad the leading axis up to a multiple (returns array + real count)."""
    n = len(x)
    return pad_leading(x, n + ((-n) % multiple)), n
