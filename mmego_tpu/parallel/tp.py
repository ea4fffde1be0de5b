"""Tensor parallelism over the mesh's ``model`` axis (GSPMD-style).

The reference is strictly single-device (SURVEY.md §2.9: the only device
logic is ``Config/config.py:31-34``), so there is no counterpart to port --
this is a TPU-native capability the design gets from XLA's GSPMD
partitioner.  The recipe is the standard JAX one: build a 2-D
``Mesh((data, model))``, keep batches sharded over ``data``, annotate the
*feature* axes of the parameter pytree with the ``model`` axis, and let the
partitioner insert the collectives (all-gather / reduce-scatter / psum)
which ride ICI on a real slice.  No model code changes: the same pure
``*_apply`` functions are jitted with differently-placed operands.

Sharding policy
---------------
Placement is decided per-leaf from the SHAPE alone (``spec_for``): the
last axis whose size is divisible by the model-axis length is sharded, the
rest stay replicated.  On this framework's pytrees that lands exactly where
Megatron-style TP would put it:

* LSTM cells (``nn/lstm.py``): ``wi (in, 4H)``/``wh (H, 4H)``/``b (4H,)``
  split over the gate/output axis -> each device computes a contiguous
  slice of the gate pre-activations; the recurrence's ``h @ wh``
  contraction over the sharded hidden axis becomes a psum.
* Linear / 1x1-conv layers (``nn/layers.py``): output-feature split
  (column parallelism), biases and BatchNorm scale/bias/running stats
  split the same way so the affine stays elementwise-local.
* Anything indivisible (e.g. the 87-wide pose head's last axis) falls
  back to the next divisible axis (row parallelism -> psum) or full
  replication -- correctness never depends on the choice, GSPMD reshards
  as needed.

Because every rule is shape-based, the SAME policy places optimizer state
(Adam's ``mu``/``nu`` mirror the parameter shapes) and BatchNorm running
stats without introspecting optax or model internals.

The heuristic can be OVERRIDDEN per leaf: ``shard_tree(..., rules=[...])``
takes ordered ``(path_regex, PartitionSpec)`` pairs matched (``re.search``)
against the leaf's ``jax.tree_util.keystr`` path; the first hit wins over
``spec_for``.  This is the escape hatch for a future layer whose batch-like
axis happens to be divisible (the shape heuristic would silently
feature-shard it): pin it with ``(r"that_layer/w", P())``.

Caveat: the hand-written Pallas kernels (ops/pallas_lstm.py) are opaque to
the partitioner -- TP runs the XLA scan path.  ``train.loop._tp_scoped``
wraps each jitted step in a kernels-off ``pallas_ctl.default_override``
scope when the mesh carries a model axis (an explicit user env setting
wins).  At this model family's sizes TP is a scale-out *capability*
(validated for numerics on the virtual mesh and by ``dryrun_multichip``'s
TP phase), not a single-chip win -- the README's perf numbers are
single-chip and do not use it.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def model_axis_size(mesh: Mesh) -> int:
    """Size of the ``model`` axis (1 when the mesh is data-only)."""
    return dict(mesh.shape).get(MODEL_AXIS, 1)


def spec_for(shape, n_model: int) -> P:
    """Shape-based placement rule: shard the LAST axis divisible by
    ``n_model`` over the model axis; replicate if none is."""
    if n_model <= 1:
        return P()
    for ax in range(len(shape) - 1, -1, -1):
        if shape[ax] >= n_model and shape[ax] % n_model == 0:
            return P(*([None] * ax + [MODEL_AXIS]))
    return P()


Rules = Sequence[Tuple[str, P]]


def shard_tree(mesh: Mesh, tree, rules: Optional[Rules] = None):
    """Place every leaf of a parameter-like pytree (params, optimizer
    state, BN running stats) according to ``spec_for``, except leaves whose
    ``keystr`` path matches a ``rules`` regex -- those take the rule's
    PartitionSpec verbatim (first match wins).  Paths look like
    ``"['fast'][0]['fwd']['wi']"``; a rule regex only needs to hit a
    distinctive fragment (e.g. ``r"fwd.*wi"``)."""
    n_model = model_axis_size(mesh)
    compiled = [(re.compile(pat), spec) for pat, spec in (rules or ())]

    def place(path, x):
        spec = None
        if compiled:
            key = jax.tree_util.keystr(path)
            for pat, s in compiled:
                if pat.search(key):
                    spec = s
                    break
        if spec is None:
            spec = spec_for(getattr(x, "shape", ()), n_model)
        from . import mesh as mesh_mod  # multi-process-safe placement
        return mesh_mod.put_global(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)
