"""Native checkpoint store: pytrees <-> compressed ``.npz``.

Replaces the reference's ``torch.save(state_dict())`` files
(``Net/IMU_Net.py:96-104``) with a torch-free format: every leaf is stored
under its slash-joined tree path, list indices included, so arbitrary nested
dict/list/tuple/NamedTuple pytrees round-trip losslessly.  Epoch-slot naming
mirrors the reference's ``epoch{E}_batch{B}frame{F}lr{LR}`` convention
(``Processor/Train/Train_IMU.py:83-88``).
"""

from __future__ import annotations

import os
import re
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(tree: Any, prefix: str = "") -> dict:
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, tuple) and hasattr(tree, "_fields"):  # NamedTuple
        items = ((k, getattr(tree, k)) for k in tree._fields)
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        return {prefix.rstrip("/"): np.asarray(tree)}
    for k, v in items:
        out.update(_flatten(v, f"{prefix}{k}/"))
    return out


def save(path: str, tree: Any) -> str:
    """Write a pytree to ``path`` (.npz). Creates parent dirs."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    flat = _flatten(jax.device_get(tree))
    np.savez_compressed(path, **flat)
    return path


def load(path: str, like: Any) -> Any:
    """Read a pytree saved by :func:`save`, shaped like the template ``like``.

    Leaves are matched by tree path; shapes must agree.
    """
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}

    def rebuild(template, prefix=""):
        if isinstance(template, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in template.items()}
        if isinstance(template, tuple) and hasattr(template, "_fields"):
            return type(template)(**{
                k: rebuild(getattr(template, k), f"{prefix}{k}/")
                for k in template._fields})
        if isinstance(template, (list, tuple)):
            seq = [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(template)]
            return type(template)(seq) if isinstance(template, tuple) else seq
        key = prefix.rstrip("/")
        if key not in flat:
            raise KeyError(f"checkpoint {path} missing leaf {key!r}")
        arr = flat[key]
        want = np.shape(template)
        if tuple(arr.shape) != tuple(want):
            raise ValueError(f"leaf {key!r}: shape {arr.shape} != template {want}")
        # Stay host-side: callers device_put the whole tree once.  Per-leaf
        # jnp.asarray here would issue hundreds of tiny H2D transfers, which
        # is painfully slow over a tunneled TPU.
        return arr.astype(np.float32) if arr.dtype == np.float64 else arr

    return rebuild(like)


def load_flat(path: str) -> dict:
    """Read a checkpoint as a flat {path: array} dict (no template needed)."""
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


# ---------------------------------------------------------------------------
# Optional Orbax backend (directory checkpoints; async-capable, multi-host
# aware).  The npz format above stays the default -- single-file, torch-free,
# diff-friendly -- but orbax round-trips the same pytrees for users who want
# its sharding/async machinery.
# ---------------------------------------------------------------------------

def save_orbax(path: str, tree: Any) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(tree), force=True)
    return path


def load_orbax(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), like)
        return ckptr.restore(path, abstract)


def epoch_path(root: str, idx: int, epoch: int, batch: int, frame: int,
               lr: float) -> str:
    """Reference-style checkpoint naming under ``{root}/model/{idx}/``."""
    return os.path.join(root, "model", str(idx),
                        f"epoch{epoch}_batch{batch}frame{frame}lr{lr}.npz")


def latest_epoch(dirpath: str) -> str | None:
    """Newest epoch checkpoint in a directory by epoch number, or None."""
    if not os.path.isdir(dirpath):
        return None
    best, best_epoch = None, -1
    for name in os.listdir(dirpath):
        if name.endswith(".state.npz"):
            continue  # BN-state sidecar of the same epoch, not the params
        m = re.match(r"epoch(\d+)_.*\.npz$", name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(dirpath, name)
    return best
