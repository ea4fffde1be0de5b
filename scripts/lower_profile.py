"""Sub-component profile of the lower stage at the demo batch (VERDICT r4 #4).

Times, with the dispatch-chained single-fetch pattern of infer.stage_timing:
  - the full lower stage (the 11.3 ms headline from docs/PERFORMANCE.md),
  - the ST-GCN skeleton branch alone (f32 default and, via
    MMEGO_GCN_STORAGE=bfloat16 child knob, the bf16-storage variant),
  - the point branch (to_head + top-64 + conv encoder),
  - the fusion tail (cross-attn colsum + LSTM + heads + FK).

Usage: python scripts/lower_profile.py [repeats]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmego_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np
import jax
import jax.numpy as jnp

from mmego_tpu.config import demo_config
from mmego_tpu.data import dataset as dataset_mod
from mmego_tpu import infer
from mmego_tpu.models import imu_net, upper_net, lower_net, stgcn
from mmego_tpu.ops import transforms, pointcloud
from mmego_tpu.nn import layers


def _sync(tree):
    for leaf in jax.tree.leaves(tree):
        np.asarray(leaf)


def timeit(name, thunk, repeats):
    _sync(jax.tree.map(jnp.sum, thunk()))          # warm compile + fetch path
    t0 = time.perf_counter()
    for _ in range(repeats):
        o = thunk()
    _sync(jax.tree.map(jnp.sum, o))
    dt = (time.perf_counter() - t0) / repeats
    print(f"{name:28s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cfg = demo_config()
    data = dataset_mod.load_split(cfg, "vis")
    params, state = infer.load_cascade_params(cfg)

    cloud = jnp.asarray(data.cloud)
    imu = jnp.asarray(data.imu)
    bones = jnp.asarray(data.bones)

    imu_jit = jax.jit(imu_net.imu_net_apply)
    upper_jit = jax.jit(lambda p, s, c, b, r, t: upper_net.upper_net_apply(
        p, s, c, b, r, t, cfg.imu_used)[:3])
    r, t = imu_jit(params.imu, imu)
    upper_l, _, cloud_h = upper_jit(params.upper, state.upper, cloud, bones, r, t)
    _sync((upper_l,))

    lower_jit = jax.jit(lambda p, s, u, c, b, rr, tt: lower_net.lower_net_apply(
        p, s, u, c, b, rr, tt, cfg.lower_pc_no, cfg.imu_used)[0])
    timeit("lower full", lambda: lower_jit(
        params.lower, state.lower, upper_l, cloud_h, bones, r, t), repeats)

    # --- skeleton branch: to_head + ST-GCN ---
    gcn_jit = jax.jit(lambda p, s, u, rr, tt: stgcn.stgcn_apply(
        p, s, transforms.to_head(u, rr, tt, True))[0])
    timeit("stgcn branch", lambda: gcn_jit(
        params.lower["gcn"], state.lower["gcn"], upper_l, r, t), repeats)

    # --- point branch: to_head + top-64 + conv encoder ---
    def point_branch(p, s, c, rr, tt):
        x = transforms.to_head(c, rr, tt, True)
        lx = pointcloud.select_top_x(x, cfg.lower_pc_no)
        v = lx
        for pp, ss in zip(p["point_encoder"], s["point_encoder"]):
            v, _ = layers.conv_bn_relu_apply(pp, ss, v, False)
        return jnp.concatenate([lx[..., :3], v], axis=-1)
    pb_jit = jax.jit(point_branch)
    timeit("point branch", lambda: pb_jit(
        params.lower, state.lower, cloud_h, r, t), repeats)

    # --- fusion tail: everything downstream of the two branches ---
    p_vec = pb_jit(params.lower, state.lower, cloud_h, r, t)
    k_vec = gcn_jit(params.lower["gcn"], state.lower["gcn"], upper_l, r, t)
    _sync((p_vec, k_vec))

    def tail(p, pv, kv, u, b, rr, tt):
        import math
        from mmego_tpu.nn import lstm
        from mmego_tpu.ops import pallas_kernels, rotation, kinematics
        bsz, l = pv.shape[:2]
        scale = 1.0 / math.sqrt(64)
        t_q = layers.linear_apply(p["to_q"], pv)
        t_k = layers.linear_apply(p["to_k"], kv)
        t_v = layers.linear_apply(p["to_v"], kv)
        h_c = t_q.shape[-1]
        tx = pallas_kernels.cross_attn_colsum(
            t_q.reshape(bsz * l, -1, h_c), t_k.reshape(bsz * l, -1, h_c),
            t_v.reshape(bsz * l, -1, h_c), scale).reshape(bsz, l, h_c)
        a_vec = jnp.concatenate([jnp.sum(pv, axis=-2), tx], axis=-1)
        ak = jnp.concatenate([a_vec, jnp.mean(kv, axis=-2)], axis=-1)
        ak, _ = lstm.lstm_apply(p["rnn_pk"], ak)
        uh = transforms.to_head(u, rr, tt, True)
        h = jnp.concatenate([ak, uh.reshape(bsz, l, -1)], axis=-1)
        h = jax.nn.relu(layers.linear_apply(p["fc0"], h))
        h = jax.nn.relu(layers.linear_apply(p["fc1"], h))
        out = layers.linear_apply(p["fc2"], h)
        q = rotation.rot6d_to_matrix(out[..., :36].reshape(bsz, l, 6, 6))
        j = kinematics.fk_lower(q, b[:, None], out[..., -6:-3], out[..., -3:])
        return transforms.to_ref(j, rr, tt, True)
    tail_jit = jax.jit(tail)
    timeit("fusion tail", lambda: tail_jit(
        params.lower, p_vec, k_vec, upper_l, bones, r, t), repeats)

    # Drift guard: the branch/tail decomposition above re-implements
    # lower_net_apply's dataflow; if the model changes, this assert fails
    # loudly instead of the profile silently measuring stale math.
    full = lower_jit(params.lower, state.lower, upper_l, cloud_h, bones, r, t)
    composed = tail_jit(params.lower, p_vec, k_vec, upper_l, bones, r, t)
    dev = float(jnp.max(jnp.abs(full - composed)))
    assert dev < 5e-2, f"profile decomposition drifted from the model: {dev}"
    print(f"decomposition check: max dev vs full stage {dev:.2e} m", flush=True)


if __name__ == "__main__":
    main()
