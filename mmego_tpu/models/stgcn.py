"""Spatial-temporal GCN skeleton encoder (the lower stage's key encoder).

Functional rebuild of ``Net/GCN.py:281-355`` (``Model.extract_feature``) over
the 15-joint upper-body graph with the 'distance' partition (K = 2).  Three
st_gcn blocks 3 -> 32 -> 64 -> 128 with learned per-block edge-importance
masks, then a 1x1 projection to ``hidden_dim``.

TPU notes:
  * The graph contraction ``einsum('nkctv,kvw->nctw', x, A)`` (GCN.py:62) is
    left to XLA (V = 15 -- a tiny matmul that fuses with the preceding 1x1
    conv); see ops/pallas for the hand-written variant used when batches are
    large enough to pay off.
  * Two reference memory-layout quirks are reproduced bit-for-bit because the
    shipped checkpoint was trained through them:
      - ``data_bn`` normalises over joint-major (V*C = 45) channels
        (GCN.py:340-343).
      - the final feature map is *raw row-major reshaped* from (N, C, T, V)
        to (N, T, V, C) (``x.view(B, t, v, -1)``, GCN.py:353) -- a scramble,
        not a transpose.  Downstream layers were trained on the scrambled
        layout, so we keep it.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mmego_tpu.nn import layers
from mmego_tpu.ops.graph import build_adjacency

TEMPORAL_KERNEL = 9
CHANNELS = (3, 32, 64, 128)


def _storage_dtype():
    """Eval-mode activation/weight storage dtype for the block stack.

    Read per trace (not at import) so tests can flip it.  Default f32:
    bf16 storage was measured to shift lower-joint positions by up to
    1.7 cm vs the f32 path on the parity fixtures
    (tests/test_model_parity.py::test_lower_net_bf16_storage_bound) --
    too coarse to ship against a ~2 cm headline metric.
    MMEGO_GCN_STORAGE=bfloat16 opts in for bandwidth experiments.

    Round-5 measurement (scripts/lower_profile.py, demo batch, v5e): the
    bf16 storage path buys ~0.3 ms on the ST-GCN branch (5.39 -> 5.10 ms)
    and nothing on the full lower stage (11.1 -> 11.2 ms) -- the branch is
    op-count/latency-bound (3 blocks x ~8 small ops over (16700, 15, C)
    tensors), not HBM-bound, so halving storage traffic does not move it.
    A mixed f32-BN/bf16-matmul scheme would inherit the same ceiling; kept
    f32 (same verdict pattern as the deleted Kronecker fold below).
    """
    import os
    name = os.environ.get("MMEGO_GCN_STORAGE", "float32")
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


def stgcn_init(rng, hidden_dim: int = 64, strategy: str = "distance") -> Tuple[dict, dict]:
    a = jnp.asarray(build_adjacency(strategy))
    k = a.shape[0]
    params = {"A": a, "edge_importance": [], "blocks": [], "data_bn": None, "fcn": None}
    state = {"data_bn": None, "blocks": []}

    rng, kbn = jax.random.split(rng)
    params["data_bn"], state["data_bn"] = layers.bn_init(CHANNELS[0] * 15)

    for i in range(3):
        cin, cout = CHANNELS[i], CHANNELS[i + 1]
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        blk = {
            "gcn_conv": layers.conv2d_init(k1, cin, cout * k, 1, 1),
            "tcn_bn1": layers.bn_init(cout)[0],
            "tcn_conv": layers.conv2d_init(k2, cout, cout, TEMPORAL_KERNEL, 1),
            "tcn_bn2": layers.bn_init(cout)[0],
        }
        blk_state = {
            "tcn_bn1": layers.bn_init(cout)[1],
            "tcn_bn2": layers.bn_init(cout)[1],
        }
        # in_channels != out_channels in every block -> conv+BN residual
        blk["res_conv"] = layers.conv2d_init(k3, cin, cout, 1, 1)
        blk["res_bn"], blk_state["res_bn"] = layers.bn_init(cout)
        params["blocks"].append(blk)
        state["blocks"].append(blk_state)
        params["edge_importance"].append(jnp.ones_like(a))

    rng, kf = jax.random.split(rng)
    params["fcn"] = layers.conv2d_init(kf, CHANNELS[-1], hidden_dim, 1, 1)
    return params, state


def _conv1x1_fl(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Feature-last 1x1 conv: x (..., C_in) with torch (O, I, 1, 1) weights."""
    return x @ p["w"][:, :, 0, 0].T + p["b"]


# A Kronecker FOLD of [conv1x1 -> graph contraction -> eval-BN1] into one
# dense (N*T, V*Cin) x (V*Cin, V*Co) matmul was built here in round 3 as an
# eval-only headroom candidate (no (N,T,V,K*Co) HBM intermediate, no skinny
# V=15 matmuls, ~6x the cheap MXU FLOPs).  Measured on the demo set
# (scripts/gcn_fold_ab.py, 2026-08-20, v5e): fold OFF 10,425 it/s median vs
# fold ON 10,328 -- ~0.9% SLOWER at identical metrics, so the fold was
# deleted per the measure-or-delete rule (XLA's fused sequential lowering
# already wins at these shapes).  Recover from git history
# (`git log -S _gcn_fold_apply`) if a much larger graph revisits it.


def _block_apply(p: dict, s: dict, x: jnp.ndarray, a: jnp.ndarray,
                 train: bool) -> Tuple[jnp.ndarray, dict]:
    """One st_gcn block, FEATURE-LAST: x (N, T, V, C) -> (N, T, V, C_out).

    Layout note: the reference (and round-2 build) runs NCHW with W = V = 15
    as the minor axis -- 15 of 128 lanes used, so every elementwise/BN/conv
    pass wastes ~88% of the VPU and pads HBM tiles.  Keeping C last puts the
    32..128-wide channel axis on the lanes; the 1x1 convs become plain
    matmuls and the (9,1) temporal conv an NHWC conv.  Math is identical
    (weights stay in torch layout, transposed at trace time).
    """
    k = a.shape[0]
    res = _conv1x1_fl(p["res_conv"], x)
    res, res_bn = layers.bn_apply(p["res_bn"], s["res_bn"], res, train)

    from mmego_tpu.ops import pallas_kernels, pallas_ctl
    y = _conv1x1_fl(p["gcn_conv"], x)                   # (N, T, V, K*C)
    n, t, v, kc = y.shape
    y = y.reshape(n, t, v, k, kc // k)
    if not train and pallas_ctl.enabled("gcn"):
        # the hand-written kernel speaks the reference NKCTV layout
        y = pallas_kernels.gcn_contract(
            y.transpose(0, 3, 4, 1, 2), a).transpose(0, 2, 3, 1)
    else:
        y = jnp.einsum("ntvkc,kvw->ntwc", y, a)
    y, bn1 = layers.bn_apply(p["tcn_bn1"], s["tcn_bn1"], y, train)
    y = jax.nn.relu(y)
    from mmego_tpu.ops import temporal_conv
    if not train and pallas_ctl.enabled("tcn"):
        # Banded-matmul lowering (ops/temporal_conv.py); default OFF -- the
        # NHWC conv lowering is faster at T=20 (docs/PERFORMANCE.md).
        y = temporal_conv.temporal_conv_matmul(
            p["tcn_conv"], y.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1)
    else:
        pad = TEMPORAL_KERNEL // 2
        y = jax.lax.conv_general_dilated(
            y, p["tcn_conv"]["w"].transpose(2, 3, 1, 0),   # OIHW -> HWIO
            window_strides=(1, 1), padding=((pad, pad), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["tcn_conv"]["b"]
    y, bn2 = layers.bn_apply(p["tcn_bn2"], s["tcn_bn2"], y, train)
    # reference st_gcn dropout is 0 in this configuration (GCN.py:313-318)

    new_s = {"tcn_bn1": bn1, "tcn_bn2": bn2, "res_bn": res_bn}
    return jax.nn.relu(y + res), new_s


def stgcn_apply(params: dict, state: dict, joints: jnp.ndarray,
                train: bool = False) -> Tuple[jnp.ndarray, dict]:
    """Extract per-joint features.

    Args:
      joints: (B, T, V=15, 3) joint positions (head frame).
    Returns:
      (features (B, T, V, hidden) in the reference's scrambled layout,
       new_state).
    """
    b, t, v, c = joints.shape
    orig_state = state
    # data_bn over joint-major channels: (B, T, V*C) feature-last.
    x = joints.reshape(b, t, v * c)
    x, dbn = layers.bn_apply(params["data_bn"], state["data_bn"], x, train)
    x = x.reshape(b, t, v, c)                           # stay feature-last

    if not train and _storage_dtype() == jnp.bfloat16:
        # bf16 storage through the blocks: the stage is HBM-bound (its
        # intermediates are ~128 MB each at C=128 and the demo batch) and
        # MXU matmuls round operands to bf16 anyway; casting weights/stats
        # once at trace time halves the streaming traffic.  f32 is kept for
        # training (grad accumulation) and restored on the output.
        # MMEGO_GCN_STORAGE=float32 opts out (parity audits; the torch
        # parity test pins the f32 path, the end-to-end accuracy gates in
        # utils/selfcheck.py cover the default).
        # jnp.asarray matters: a NUMPY bfloat16 leaf (torch-imported weights
        # are numpy) re-promotes to f32 when mixed with jnp bf16 arrays,
        # silently undoing the cast (and mixing dtypes at the conv).
        cast = lambda tree: jax.tree.map(
            lambda a: jnp.asarray(a, jnp.bfloat16)
            if a.dtype == jnp.float32 else a, tree)
        params = {**cast({k: params[k] for k in
                          ("blocks", "edge_importance", "fcn")}),
                  "A": cast(params["A"]), "data_bn": params["data_bn"]}
        state = {**cast({"blocks": state["blocks"]}),
                 "data_bn": state["data_bn"]}
        x = x.astype(jnp.bfloat16)

    new_blocks = []
    # A is a fixed buffer in the reference (register_buffer, GCN.py:306-307):
    # only edge_importance trains.  stop_gradient keeps Adam from drifting
    # the normalized skeleton adjacency.
    a_fixed = jax.lax.stop_gradient(params["A"])
    for p_blk, s_blk, imp in zip(params["blocks"], state["blocks"],
                                 params["edge_importance"]):
        x, ns = _block_apply(p_blk, s_blk, x, a_fixed * imp, train)
        new_blocks.append(ns)

    x = _conv1x1_fl(params["fcn"], x)                   # (B, T, V, H)
    hidden = x.shape[-1]
    # Reference scrambled view (GCN.py:353): raw row-major reshape of the
    # NCHW tensor -- reproduce by one transpose back to (B, H, T, V) first.
    feats = x.transpose(0, 3, 1, 2).reshape(b, t, v, hidden)
    # eval mode never updates BN state; return the caller's (f32) originals
    # rather than the bf16 trace copies
    new_state = (orig_state if not train
                 else {"data_bn": dbn, "blocks": new_blocks})
    return feats.astype(jnp.float32), new_state
