"""Pallas TPU kernel: full LSTM recurrence in one kernel launch.

The cascade's dominant cost is the IMU stage's LSTM recurrences
(~16,700 rows x 20 steps x 4 layer-directions at hidden 512).  The lax.scan
implementation dispatches each step as separate XLA ops; this kernel runs the
whole recurrence for a block of batch rows inside a single ``pallas_call``:

  * grid = (batch_blocks, T) -- the TPU grid executes sequentially on a core,
    so VMEM scratch (h, c) legally carries state across the T axis;
  * the hidden-to-gate weight matrix lives in VMEM for the entire kernel
    (512 x 2048 f32 = 4 MB);
  * the precomputed input projections stream in one (block, t) tile per grid
    step through the automatic BlockSpec pipeline (double-buffered by Pallas),
    overlapping the DMA with the MXU matmul;
  * the reversed direction is expressed purely in the index maps
    (t -> T-1-t) -- no data flips (see nn/lstm.py for why flips are banned).

Exposed as ``lstm_scan_direction(p, x, reverse)`` with the same semantics as
``nn.lstm._scan_direction`` (zero initial state, returns the full output
sequence).  Forward-only (no VJP): inference paths opt in via MMEGO_PALLAS=1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_B = 512


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _lstm_kernel(xp_ref, wh_ref, o_ref, h_ref, c_ref):
    """One (batch-block, timestep) grid cell.

    xp_ref: (1, BLOCK_B, 4H) time-major input projection for this block/step.
    wh_ref: (H, 4H) resident weights.  o_ref: (1, BLOCK_B, H) output.
    h_ref/c_ref: (BLOCK_B, H) VMEM scratch carrying the recurrence.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    gates = xp_ref[0] + jnp.dot(h_ref[:], wh_ref[:],
                                preferred_element_type=jnp.float32)
    hidden = wh_ref.shape[0]
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden:])
    c = f * c_ref[:] + i * g
    h = o * jnp.tanh(c)
    h_ref[:] = h
    c_ref[:] = c
    o_ref[0] = h


def lstm_scan_direction(p: dict, x: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """Pallas equivalent of one direction of nn.lstm._scan_direction.

    Args:
      p: {"wi": (F, 4H), "wh": (H, 4H), "b": (4H,)}.
      x: (B, T, F).
    Returns:
      outputs (B, T, H) (final h/c are not materialised -- the reference
      architecture never consumes them).
    """
    from mmego_tpu.nn.lstm import _PRECISION  # honor MMEGO_LSTM_PRECISION

    b, t, _ = x.shape
    hidden = p["wh"].shape[0]
    # Time-major (T, B, 4H): TPU block shapes constrain the last two dims, so
    # the per-step tile must be a (1, BLOCK_B, 4H) leading-time slab.
    xp = jnp.einsum("btf,fg->tbg", x, p["wi"], precision=_PRECISION) + p["b"]

    bp = _round_up(b, BLOCK_B)
    if bp != b:
        xp = jnp.pad(xp, ((0, 0), (0, bp - b), (0, 0)))
    nb = bp // BLOCK_B

    if reverse:
        xp_index = lambda i, tt: (t - 1 - tt, i, 0)
    else:
        xp_index = lambda i, tt: (tt, i, 0)

    out = pl.pallas_call(
        _lstm_kernel,
        grid=(nb, t),
        in_specs=[
            pl.BlockSpec((1, BLOCK_B, 4 * hidden), xp_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 4 * hidden), lambda i, tt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_B, hidden), xp_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, bp, hidden), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_B, hidden), jnp.float32),
            pltpu.VMEM((BLOCK_B, hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(xp, p["wh"])
    return jnp.swapaxes(out, 0, 1)[:b]                      # (B, T, H)
