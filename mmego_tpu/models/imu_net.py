"""Stage 1: IMU_Net -- head rotation + position from the IMU stream.

Functional rebuild of ``Net/IMU_Net.py:50-94``: fc(15->512) -> 2-layer
bidirectional "fast" LSTM over the 20 IMU samples of each frame -> attention
pooling -> 2-layer bidirectional "slow" LSTM over the frame window ->
fc(1024->9), first 6 channels orthogonalised to a rotation (rot6d), last 3 the
head position.  ~23.1 M parameters; the reference's pretrained checkpoint is
missing upstream (SURVEY.md §0) so this framework trains the stage itself.

The reference model also owns an ``fc3`` layer (IMU_Net.py:55) that its
forward pass never touches; it is omitted here.

TPU shape strategy: both LSTM stacks flatten all leading dims into one big
batch so each scan step is a single (B*, 512) @ (512, 2048) MXU matmul;
the fast stack runs with B* = batch*frames.
"""

from __future__ import annotations

from typing import Tuple

import jax
from functools import partial
import jax.numpy as jnp

from mmego_tpu.nn import layers, lstm
from mmego_tpu.ops import rotation

INPUT_FEATURES = 15
HIDDEN = 512
NUM_LAYERS = 2
OUTPUT = 9


# init is jitted: pure + PRNG-deterministic, and eager per-leaf
# uniform draws cost seconds per net on the 8-device CPU test mesh.
@partial(jax.jit, static_argnames=("hidden", "num_layers"))
def imu_net_init(rng, hidden: int = HIDDEN, num_layers: int = NUM_LAYERS) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    return {
        "fc1": layers.linear_init(k1, INPUT_FEATURES, hidden),
        "rnn_fast": lstm.lstm_init(k2, hidden, hidden, num_layers, True),
        "attn": layers.linear_init(k3, 2 * hidden, 1),
        "rnn_slow": lstm.lstm_init(k4, 2 * hidden, hidden, num_layers, True),
        "fc2": layers.linear_init(k5, 2 * hidden, OUTPUT),
    }


def imu_net_apply(params: dict, imu: jnp.ndarray, dropout: float = 0.0,
                  rng=None, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward pass.

    Args:
      imu: (B, L, N=20, 15) window of IMU packets.
    Returns:
      (R (B, L, 3, 3), t (B, L, 3)).
    """
    b, l, n, f = imu.shape

    if train and rng is not None:
        rng, r_fast, r_slow = jax.random.split(rng, 3)
    else:
        r_fast = r_slow = None

    from mmego_tpu.ops import pallas_ctl
    if pallas_ctl.enabled("lstm") and not train and lstm._PRECISION is None:
        # Kernel path: pool straight from the fused stack's time-major bf16
        # direction halves -- skips the (B*L, T, 2H) concat + transpose +
        # f32 cast that the batch-major interface would materialise (~2.7 GB
        # of HBM churn at demo shapes).  Same math: logits over the concat
        # split into per-half matmuls; softmax over time in f32.
        #
        # The fc1 projection itself runs TIME-MAJOR on a pre-padded batch:
        # transposing/padding the 15-feature INPUT costs ~20 MB of copies
        # instead of the ~700 MB transpose+pad+cast of fc1's 512-wide
        # output that a batch-major stack entry would re-materialise.  Padded rows
        # carry relu(b) garbage; each recurrence row is independent and the
        # pool below slices [: b * l].
        from mmego_tpu.ops import pallas_lstm
        imu_tm = jnp.swapaxes(imu.reshape(b * l, n, f), 0, 1)  # (N, BL, 15)
        bl_p = pallas_lstm._round_up(b * l, pallas_lstm.preferred_block())
        if bl_p != b * l:
            imu_tm = jnp.pad(imu_tm, ((0, 0), (0, bl_p - b * l), (0, 0)))
        x_tm = jax.nn.relu(layers.linear_apply(params["fc1"], imu_tm)
                           ).astype(jnp.bfloat16)
        aw, ab = params["attn"]["w"], params["attn"]["b"]
        # logits ride the last layer's kernels (one (BB,H)@(H,1) dot per
        # step on the fresh in-VMEM h) instead of a post-hoc read pass
        y_f, y_b, logits = pallas_lstm.fused_stack_tm_attn(
            params["rnn_fast"], x_tm, aw, ab)            # logits (T, BP, 1)
        wgt = jax.nn.softmax(logits, axis=0)
        pooled = jnp.concatenate(
            [jnp.sum(y_f * wgt, axis=0), jnp.sum(y_b * wgt, axis=0)],
            axis=-1)[: b * l].reshape(b, l, -1)          # (B, L, 2H) f32
    else:
        x = jax.nn.relu(layers.linear_apply(params["fc1"], imu))
        x = x.reshape(b * l, n, -1)
        fast, _ = lstm.lstm_apply(params["rnn_fast"], x, dropout, r_fast, train)
        w = jax.nn.softmax(layers.linear_apply(params["attn"], fast), axis=1)
        pooled = jnp.sum(fast * w, axis=1).reshape(b, l, -1)

    slow, _ = lstm.lstm_apply(params["rnn_slow"], pooled, dropout, r_slow, train)

    out = layers.linear_apply(params["fc2"], slow)      # (B, L, 9)
    r = rotation.rot6d_to_matrix(out[..., :6])
    t = out[..., 6:]
    return r, t


def param_count(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
