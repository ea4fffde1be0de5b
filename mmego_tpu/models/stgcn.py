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


def _block_apply(p: dict, s: dict, x: jnp.ndarray, a: jnp.ndarray,
                 train: bool) -> Tuple[jnp.ndarray, dict]:
    """One st_gcn block.  x: (N, C, T, V) -> (N, C_out, T, V)."""
    k = a.shape[0]
    res = layers.conv2d_apply(p["res_conv"], x)
    res, res_bn = layers.bn_apply(p["res_bn"], s["res_bn"], res, train, axis=1)

    y = layers.conv2d_apply(p["gcn_conv"], x)           # (N, K*C, T, V)
    n, kc, t, v = y.shape
    y = y.reshape(n, k, kc // k, t, v)
    # jnp.einsum by default; fused Pallas kernel when MMEGO_PALLAS=1.  The
    # kernel defines no VJP, so training always takes the jnp path.
    from mmego_tpu.ops import pallas_kernels
    y = pallas_kernels.gcn_contract(y, a, use_pallas=False if train else None)

    y, bn1 = layers.bn_apply(p["tcn_bn1"], s["tcn_bn1"], y, train, axis=1)
    y = jax.nn.relu(y)
    from mmego_tpu.ops import pallas_ctl, temporal_conv
    if not train and pallas_ctl.enabled("tcn"):
        # Banded-matmul lowering: one dense MXU matmul instead of a
        # sub-tile (9,1) conv (ops/temporal_conv.py).  Measured at the demo
        # shapes the conv lowering is already faster (11.4 vs 12.9 ms for
        # the whole lower stage, docs/PERFORMANCE.md) -- the band's 20/9
        # FLOP overhead outweighs its tiling advantage -- so the default is
        # OFF (MMEGO_PALLAS_TCN=1 opts in for T >> k regimes).
        y = temporal_conv.temporal_conv_matmul(p["tcn_conv"], y)
    else:
        pad = TEMPORAL_KERNEL // 2
        y = layers.conv2d_apply(p["tcn_conv"], y, padding=((pad, pad), (0, 0)))
    y, bn2 = layers.bn_apply(p["tcn_bn2"], s["tcn_bn2"], y, train, axis=1)
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
    # data_bn over joint-major channels: (B, T, V*C) feature-last.
    x = joints.reshape(b, t, v * c)
    x, dbn = layers.bn_apply(params["data_bn"], state["data_bn"], x, train)
    # to NCHW = (B, C, T, V)
    x = x.reshape(b, t, v, c).transpose(0, 3, 1, 2)

    new_blocks = []
    # A is a fixed buffer in the reference (register_buffer, GCN.py:306-307):
    # only edge_importance trains.  stop_gradient keeps Adam from drifting
    # the normalized skeleton adjacency.
    a_fixed = jax.lax.stop_gradient(params["A"])
    for p_blk, s_blk, imp in zip(params["blocks"], state["blocks"],
                                 params["edge_importance"]):
        x, ns = _block_apply(p_blk, s_blk, x, a_fixed * imp, train)
        new_blocks.append(ns)

    x = layers.conv2d_apply(params["fcn"], x)           # (B, H, T, V)
    hidden = x.shape[1]
    # Reference scrambled view (GCN.py:353): raw row-major reshape.
    feats = x.reshape(b, t, v, hidden)
    return feats, {"data_bn": dbn, "blocks": new_blocks}
