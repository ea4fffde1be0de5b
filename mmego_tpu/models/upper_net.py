"""Stage 2: Upper_Net -- 15 upper-body joints from the radar point cloud.

Functional rebuild of ``Net/Upper_Net.py:367-404`` (the active, checkpoint-
loadable ``UpperNet``): head-frame transform -> per-point MLP ("PointNet",
6->8->16->24 + raw-feature concat to 28) -> GlobalPointNet (28->32->48->64) +
attention pooling over points -> 3-layer bidirectional LSTM over the window ->
MLP head emitting 14 rot6d joint rotations + head position -> forward
kinematics -> back to the reference frame.

Every "Conv1d(kernel_size=1)" of the reference is a feature-last matmul here;
the point axis rides in the batch, so the whole per-point pipeline is three
MXU matmuls over (B*L*128, C) with BN+ReLU fused in by XLA.

Cascade-critical dataflow note: the reference's ``Transform2H`` mutates the
caller's cloud in place (Utils.py:290), so after UpperNet runs, the cloud that
the *lower* stage receives is already in the head frame.  ``upper_net_apply``
therefore also returns its internally transformed cloud; models/cascade.py
threads it onward to reproduce the reference numerics exactly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mmego_tpu.nn import layers, lstm
from mmego_tpu.ops import rotation, transforms, kinematics

NUM_JOINTS = 15
NUM_ROT = 14
POINT_CHANNELS = (6, 8, 16, 24)
GLOBAL_CHANNELS = (28, 32, 48, 64)
RNN_HIDDEN = 64
RNN_LAYERS = 3
RNN_DROPOUT = 0.1


# init is jitted: pure + PRNG-deterministic, and eager per-leaf
# uniform draws cost seconds per net on the 8-device CPU test mesh.
@jax.jit
def upper_net_init(rng) -> Tuple[dict, dict]:
    keys = jax.random.split(rng, 12)
    params, state = {}, {}

    # module0: PointNet (Upper_Net.py:242-268)
    pn_p, pn_s = [], []
    for i in range(3):
        p, s = layers.conv_bn_relu_init(keys[i], POINT_CHANNELS[i], POINT_CHANNELS[i + 1])
        pn_p.append(p)
        pn_s.append(s)
    params["pointnet"], state["pointnet"] = pn_p, pn_s

    # module1: GlobalPointNet + attention pool + bi-LSTM (Upper_Net.py:271-340)
    gp_p, gp_s = [], []
    for i in range(3):
        p, s = layers.conv_bn_relu_init(keys[3 + i], GLOBAL_CHANNELS[i], GLOBAL_CHANNELS[i + 1])
        gp_p.append(p)
        gp_s.append(s)
    params["global_pointnet"], state["global_pointnet"] = gp_p, gp_s
    params["global_attn"] = layers.attn_pool_init(keys[6], GLOBAL_CHANNELS[-1])
    params["grnn"] = lstm.lstm_init(keys[7], RNN_HIDDEN, RNN_HIDDEN, RNN_LAYERS, True)

    # mlpHead (Upper_Net.py:343-364)
    params["head_fc1"] = layers.linear_init(keys[8], 2 * RNN_HIDDEN, 128)
    params["head_fc2"] = layers.linear_init(keys[9], 128, NUM_ROT * 6 + 3)
    return params, state


def upper_net_apply(params: dict, state: dict, cloud: jnp.ndarray,
                    bones: jnp.ndarray, r: jnp.ndarray, t: jnp.ndarray,
                    imu_used: bool = True, train: bool = False, rng=None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """Forward pass.

    Args:
      cloud: (B, L, N, 6) radar cloud in the reference frame.
      bones: (B, 20, 3) calibrated bone vectors (``initial_body``).
      r, t: (B, L, 3, 3) / (B, L, 3) head rotation / position from stage 1.
    Returns:
      (joints (B, L, 15, 3) in the reference frame,
       q (B, L, 14, 3, 3) joint rotations,
       cloud_h (B, L, N, 6) the head-frame cloud (reference in-place mutation),
       new_state).
    """
    b, l, n, _ = cloud.shape
    cloud_h = transforms.to_head(cloud, r, t, imu_used)

    # Per-point MLP; point axis flattened into the batch.
    x = cloud_h
    new_pn = []
    for p, s in zip(params["pointnet"], state["pointnet"]):
        x, ns = layers.conv_bn_relu_apply(p, s, x, train)
        new_pn.append(ns)
    x = jnp.concatenate([cloud_h[..., :4], x], axis=-1)          # (B, L, N, 28)

    new_gp = []
    for p, s in zip(params["global_pointnet"], state["global_pointnet"]):
        x, ns = layers.conv_bn_relu_apply(p, s, x, train)
        new_gp.append(ns)
    g = layers.attn_pool_apply(params["global_attn"], x, axis=-2,
                               train=train)      # (B, L, 64)

    g_vec, _ = lstm.lstm_apply(params["grnn"], g, RNN_DROPOUT, rng, train)

    h = jax.nn.relu(layers.linear_apply(params["head_fc1"], g_vec))
    out = layers.linear_apply(params["head_fc2"], h)               # (B, L, 87)
    q = rotation.rot6d_to_matrix(out[..., : NUM_ROT * 6].reshape(b, l, NUM_ROT, 6))
    head = out[..., -3:]

    joints_h = kinematics.fk_upper(q, bones[:, None], head)
    joints = transforms.to_ref(joints_h, r, t, imu_used)

    new_state = {"pointnet": new_pn, "global_pointnet": new_gp}
    return joints, q, cloud_h, new_state
