"""Upper_Net variant with the anchor-voxel local branch (``UpperNetwlocal``).

Functional rebuild of ``Net/Upper_Net.py:406-451`` and the LocalModule family
(``Upper_Net.py:147-239``): a 3x3x3 anchor lattice in the head frame groups
the 8 nearest cloud points per anchor (``ops/pointcloud.anchor_grouping``);
each group runs a small PointNet (31->32->48->64) with attention pooling, the
27 anchor features form a voxel grid encoded by a 3-D conv stack
(64->96->128->64, kernel 3 then 1x1s -- with a 3^3 input this collapses to
matmuls on the MXU), a 3-layer bi-LSTM tracks the window, and a CombineModule
fuses global + local vectors into the rot6d head.

No checkpoint for this variant ships upstream (the released Upper weights
carry the non-local ``module0/module1/mlpHead`` schema -- SURVEY.md §0), so
this path is init/train-only.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mmego_tpu.nn import layers, lstm
from mmego_tpu.ops import rotation, transforms, kinematics, pointcloud

NUM_ROT = 14
LOCAL_IN = 24 + 4 + 3  # grouped features: anchor xyz + rel xyz + 25 point feats... see apply
LOCAL_CHANNELS = (31, 32, 48, 64)
VOXEL_CHANNELS = (64, 96, 128, 64)
NSAMPLE = 8
RNN_DROPOUT = 0.1


def _conv3d_init(rng, cin, cout, k):
    k1, k2 = jax.random.split(rng)
    fan_in = cin * k ** 3
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    return {"w": jax.random.uniform(k1, (cout, cin, k, k, k), jnp.float32, -bound, bound),
            "b": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound)}


def _conv3d_full_apply(p, x):
    """3-D conv whose kernel covers the whole (3,3,3) grid == one matmul.
    x: (N, 3, 3, 3, C) channel-last; torch OIZYX weights."""
    n = x.shape[0]
    cin = x.shape[-1]
    # torch layout contracts over (c, z, y, x); order the flatten to match.
    xf = x.transpose(0, 4, 1, 2, 3).reshape(n, -1)        # (N, C*27)
    wf = p["w"].reshape(p["w"].shape[0], -1)              # (O, C*27)
    return xf @ wf.T + p["b"]


# init is jitted: pure + PRNG-deterministic, and eager per-leaf
# uniform draws cost seconds per net on the 8-device CPU test mesh.
@jax.jit
def upper_local_init(rng) -> Tuple[dict, dict]:
    keys = jax.random.split(rng, 16)
    params, state = {}, {}

    from mmego_tpu.models.upper_net import POINT_CHANNELS, GLOBAL_CHANNELS, RNN_HIDDEN, RNN_LAYERS
    pn_p, pn_s = [], []
    for i in range(3):
        p, s = layers.conv_bn_relu_init(keys[i], POINT_CHANNELS[i], POINT_CHANNELS[i + 1])
        pn_p.append(p)
        pn_s.append(s)
    params["pointnet"], state["pointnet"] = pn_p, pn_s

    gp_p, gp_s = [], []
    for i in range(3):
        p, s = layers.conv_bn_relu_init(keys[3 + i], GLOBAL_CHANNELS[i], GLOBAL_CHANNELS[i + 1])
        gp_p.append(p)
        gp_s.append(s)
    params["global_pointnet"], state["global_pointnet"] = gp_p, gp_s
    params["global_attn"] = layers.attn_pool_init(keys[6], GLOBAL_CHANNELS[-1])
    params["grnn"] = lstm.lstm_init(keys[7], RNN_HIDDEN, RNN_HIDDEN, RNN_LAYERS, True)

    # LocalModule
    lp_p, lp_s = [], []
    for i in range(3):
        p, s = layers.conv_bn_relu_init(keys[8 + i], LOCAL_CHANNELS[i], LOCAL_CHANNELS[i + 1])
        lp_p.append(p)
        lp_s.append(s)
    params["local_pointnet"], state["local_pointnet"] = lp_p, lp_s
    params["local_attn"] = layers.attn_pool_init(keys[11], LOCAL_CHANNELS[-1])

    vox_p, vox_s = [], []
    for i, k in enumerate((3, 1, 1)):
        cp = _conv3d_init(jax.random.fold_in(keys[12], i),
                          VOXEL_CHANNELS[i], VOXEL_CHANNELS[i + 1], k)
        bp, bs = layers.bn_init(VOXEL_CHANNELS[i + 1])
        vox_p.append({"conv": cp, "bn": bp})
        vox_s.append({"bn": bs})
    params["voxel"], state["voxel"] = vox_p, vox_s
    params["arnn"] = lstm.lstm_init(keys[13], 64, 64, 3, True)

    # CombineModule (Upper_Net.py:304-326)
    params["comb_fc1"] = layers.linear_init(keys[14], 256, 128)
    params["comb_fc2"] = layers.linear_init(keys[15], 128, NUM_ROT * 6 + 3)
    return params, state


def upper_local_apply(params: dict, state: dict, cloud: jnp.ndarray,
                      bones: jnp.ndarray, r: jnp.ndarray, t: jnp.ndarray,
                      imu_used: bool = True, train: bool = False, rng=None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """Forward pass; signature mirrors upper_net_apply."""
    b, l, n, _ = cloud.shape
    cloud_h = transforms.to_head(cloud, r, t, imu_used)

    x = cloud_h
    new_pn = []
    for p, s in zip(params["pointnet"], state["pointnet"]):
        x, ns = layers.conv_bn_relu_apply(p, s, x, train)
        new_pn.append(ns)
    xf = jnp.concatenate([cloud_h[..., :4], x], axis=-1)          # (B, L, N, 28)

    # ---- global branch
    g = xf
    new_gp = []
    for p, s in zip(params["global_pointnet"], state["global_pointnet"]):
        g, ns = layers.conv_bn_relu_apply(p, s, g, train)
        new_gp.append(ns)
    g = layers.attn_pool_apply(params["global_attn"], g, axis=-2, train=train)
    if rng is not None:
        rng_g, rng_a = jax.random.split(rng)
    else:
        rng_g = rng_a = None
    g_vec, _ = lstm.lstm_apply(params["grnn"], g, RNN_DROPOUT, rng_g, train)

    # ---- local branch: anchor grouping over the 3x3x3 lattice
    anchors = pointcloud.anchor_grid().reshape(1, 1, 27, 3)
    anchors = jnp.broadcast_to(anchors, (b, l, 27, 3))
    grouped = pointcloud.anchor_grouping(
        anchors, NSAMPLE, xf[..., :3], xf[..., 3:])               # (B, L, 27, 8, 31)

    v = grouped
    new_lp = []
    for p, s in zip(params["local_pointnet"], state["local_pointnet"]):
        v, ns = layers.conv_bn_relu_apply(p, s, v, train)
        new_lp.append(ns)
    v = layers.attn_pool_apply(params["local_attn"], v, axis=-2,
                               train=train)      # (B, L, 27, 64)

    v = v.reshape(b * l, 3, 3, 3, 64)
    new_vox = []
    for i, (p, s) in enumerate(zip(params["voxel"], state["voxel"])):
        if i == 0:
            v = _conv3d_full_apply(p["conv"], v)                  # (B*L, 96)
        else:
            v = v @ p["conv"]["w"].reshape(p["conv"]["w"].shape[:2]).T + p["conv"]["b"]
        v, bns = layers.bn_apply(p["bn"], s["bn"], v, train)
        v = jax.nn.relu(v)
        new_vox.append({"bn": bns})
    v = v.reshape(b, l, 64)
    a_vec, _ = lstm.lstm_apply(params["arnn"], v, RNN_DROPOUT, rng_a, train)

    # ---- combine
    h = jnp.concatenate([g_vec, a_vec], axis=-1)                  # (B, L, 256)
    h = jax.nn.relu(layers.linear_apply(params["comb_fc1"], h))
    out = layers.linear_apply(params["comb_fc2"], h)
    q = rotation.rot6d_to_matrix(out[..., : NUM_ROT * 6].reshape(b, l, NUM_ROT, 6))
    head = out[..., -3:]

    joints_h = kinematics.fk_upper(q, bones[:, None], head)
    joints = transforms.to_ref(joints_h, r, t, imu_used)

    new_state = {"pointnet": new_pn, "global_pointnet": new_gp,
                 "local_pointnet": new_lp, "voxel": new_vox}
    return joints, q, cloud_h, new_state
