"""Pallas TPU kernels: full LSTM recurrences in single kernel launches.

The cascade's dominant cost is the IMU stage's LSTM recurrences
(~16,700 rows x 20 steps x 4 layer-directions at hidden 512).  Two kernel
generations live here:

``lstm_scan_direction`` (v1)
  Streams a precomputed input projection ``xp = x @ wi + b`` from HBM, one
  (block, t) tile per grid step.  Correct but HBM-bound: xp is 4x larger
  than x, and it makes a full HBM round trip (write by the einsum, read by
  the kernel) per layer-direction.

``fused_stack`` (v2)
  Runs the ENTIRE multi-layer bidirectional stack with the input projection
  fused INTO the recurrence kernel:

  * per (layer, direction) one ``pallas_call`` with grid (batch_blocks, T);
    the TPU grid executes sequentially on a core, so VMEM scratch (h, c)
    legally carries the recurrence across the T axis;
  * all weights (wi, wh) live in VMEM for the whole kernel in bf16 -- the
    MXU's native input precision (XLA's 'default' f32 matmul rounds operands
    to bf16 anyway, so this loses nothing vs the scan path);
  * x streams in one (block, t) bf16 tile per grid step (double-buffered by
    the BlockSpec pipeline); gates accumulate in f32 and NEVER round-trip
    through HBM -- per layer-direction the traffic drops from ~5 reads+writes
    of the 4H-wide xp to one read of x and one write of y;
  * layer outputs stay time-major and split per direction; the next layer's
    input projection consumes the two halves as separate operands
    (``dot(y_f, wi[:H]) + dot(y_b, wi[H:])``), so no concatenation copy is
    ever materialised between layers;
  * the reversed direction is expressed purely in the index maps
    (t -> T-1-t) -- no data flips (see nn/lstm.py for why flips are banned).

``_fused_pipe_kernel`` (v3 -- what ships; ``MMEGO_LSTM_PIPE=0`` pins v2)
  v2 with the x-projection software-pipelined one grid step ahead through a
  VMEM gate-accumulator scratch, so the MXU's x-dots for step t+1 overlap
  the VPU gate chain of step t (45.5 vs 48.0 ms on the demo fast stack;
  scripts/lstm_kernel_bench.py).  Optionally also emits the IMU
  attention-pool logits per step from the in-VMEM h (``fused_stack_tm_attn``).
  Small batches take one whole-batch v2 block instead -- see ``_plan``.

The raw kernels are forward-only (no JVP/transpose rules); the public
entry points are custom_vjp wrappers whose backward passes recompute with
the lax.scan stack (training's eval-mode forwards differentiate through
them).  Numerics: state is f32, gate accumulation is f32; only x/y storage
and the weights are bf16.  The recurrence itself is batch-invariant (each
output row of every matmul depends only on its own input row; K-reduction
tiling is fixed by the block shapes), which the backend selfcheck verifies
end-to-end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_B = 512
# batches at or under this run as ONE whole-batch block (v2 kernel): VMEM
# fits up to ~896 rows at the model's F<=1024/H=512 shapes, and fewer grid
# steps beat pipelining when there are only ~20 of them per direction.
SMALL_BATCH_ONE_BLOCK = 896
# lane width of the in-kernel attention-logit scratch (T <= 128 steps)
LOGIT_LANES = 128


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


# ---------------------------------------------------------------------------
# v2: fused multi-layer bidirectional stack (input projection in-kernel)
# ---------------------------------------------------------------------------

def _fused_kernel(*refs, n_in: int, hidden: int):
    """One (batch-block, timestep) grid cell of one direction of one layer.

    refs: x_1..x_n tiles (1, BB, F_i) bf16, wi_1..wi_n (F_i, 4H) bf16,
    wh (H, 4H) bf16, b (1, 4H) f32, out (1, BB, H) bf16,
    scratch h/c (BB, H) f32.
    """
    xs = refs[:n_in]
    wis = refs[n_in:2 * n_in]
    wh_ref, b_ref, o_ref, h_ref, c_ref = refs[2 * n_in:]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    gates = b_ref[:]                                     # (1, 4H) f32, bcast
    for x_ref, wi_ref in zip(xs, wis):
        gates = gates + jnp.dot(x_ref[0], wi_ref[:],
                                preferred_element_type=jnp.float32)
    gates = gates + jnp.dot(h_ref[:].astype(jnp.bfloat16), wh_ref[:],
                            preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden:])
    c = f * c_ref[:] + i * g
    h = o * jnp.tanh(c)
    h_ref[:] = h
    c_ref[:] = c
    o_ref[0] = h.astype(o_ref.dtype)


def _fused_direction(p: dict, xs, reverse: bool, block_b: int) -> jnp.ndarray:
    """One direction of one layer over pre-padded time-major bf16 inputs.

    Args:
      p: {"wi": (F, 4H) f32, "wh": (H, 4H) f32, "b": (4H,) f32} with
         F = sum of the xs feature dims (wi rows are split to match).
      xs: list of (T, BP, F_i) bf16 arrays, BP a multiple of block_b.
    Returns:
      y (T, BP, H) bf16.
    """
    t, bp, _ = xs[0].shape
    hidden = p["wh"].shape[0]
    nb = bp // block_b

    wi = p["wi"].astype(jnp.bfloat16)
    wi_parts, off = [], 0
    for x in xs:
        wi_parts.append(wi[off:off + x.shape[2]])
        off += x.shape[2]
    wh = p["wh"].astype(jnp.bfloat16)
    b = p["b"].astype(jnp.float32).reshape(1, 4 * hidden)

    if reverse:
        tix = lambda i, tt: (t - 1 - tt, i, 0)
    else:
        tix = lambda i, tt: (tt, i, 0)
    resident = lambda i, tt: (0, 0)

    in_specs = [
        pl.BlockSpec((1, block_b, x.shape[2]), tix, memory_space=pltpu.VMEM)
        for x in xs
    ] + [
        pl.BlockSpec(w.shape, resident, memory_space=pltpu.VMEM)
        for w in wi_parts
    ] + [
        pl.BlockSpec(wh.shape, resident, memory_space=pltpu.VMEM),
        pl.BlockSpec(b.shape, resident, memory_space=pltpu.VMEM),
    ]

    return pl.pallas_call(
        functools.partial(_fused_kernel, n_in=len(xs), hidden=hidden),
        grid=(nb, t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_b, hidden), tix,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, bp, hidden), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((block_b, hidden), jnp.float32),
            pltpu.VMEM((block_b, hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(*xs, *wi_parts, wh, b)


def _plan(rows: int, block_b: int | None = None):
    """Kernel generation + batch block for a stack over ``rows`` batch rows.

    v3 (software-pipelined x-projection) by default: measured 45.5 ms vs
    v2's 48.0 ms on the demo fast stack (scripts/lstm_kernel_bench.py,
    block 448 the sweep optimum).  MMEGO_LSTM_PIPE=0 pins v2 for A/B.
    Small batches (the slow stack's 835 windows) instead run as ONE
    whole-batch block in the v2 kernel: fewer grid steps beat pipelining at
    20-step depth, and v3's f32 gate scratch would blow VMEM at that block
    size.  An explicit ``block_b`` (tests, sweeps) overrides everything but
    still selects v2 below the small-batch bound.
    """
    import os
    pipe = os.environ.get("MMEGO_LSTM_PIPE", "1") == "1"
    if _round_up(rows, 8) <= SMALL_BATCH_ONE_BLOCK:
        return False, min(block_b or 1 << 30, _round_up(rows, 8))
    if block_b is None:
        block_b = 448 if pipe else BLOCK_B
    return pipe, min(block_b, _round_up(rows, 8))


def _pad_rows(x_tm: jnp.ndarray, block_b: int) -> jnp.ndarray:
    t, bp, f = x_tm.shape
    if bp % block_b:
        x_tm = jnp.pad(x_tm, ((0, 0), (0, _round_up(bp, block_b) - bp),
                              (0, 0)))
    return x_tm


def _run_stack(params, x_tm: jnp.ndarray, block_b: int, pipe: bool,
               attn=None):
    """Shared stack driver over a (T, BP, F) input, BP % block_b == 0.

    attn: optional (aw (2H, 1) f32, ab (1,) f32) -- the last layer then also
    returns the attention-pool logits (in-kernel on the pipe path, post-hoc
    einsums on v2).
    """
    direction = _fused_pipe_direction if pipe else _fused_direction
    xs = [x_tm.astype(jnp.bfloat16)]
    for li, layer in enumerate(params):
        if attn is not None and pipe and li == len(params) - 1:
            aw, ab = attn
            hidden = layer["fwd"]["wh"].shape[0]
            y_f, l_f = _fused_pipe_direction(layer["fwd"], xs, False,
                                             block_b, attn_w=aw[:hidden])
            y_b, l_b = _fused_pipe_direction(layer["bwd"], xs, True,
                                             block_b, attn_w=aw[hidden:])
            return y_f, y_b, l_f + l_b + ab
        y_f = direction(layer["fwd"], xs, False, block_b)
        y_b = direction(layer["bwd"], xs, True, block_b)
        xs = [y_f, y_b]
    if attn is None:
        return xs[0], xs[1]
    aw, ab = attn
    hidden = params[-1]["fwd"]["wh"].shape[0]
    logits = (jnp.einsum("tbh,ho->tbo", xs[0].astype(jnp.float32),
                         aw[:hidden]) +
              jnp.einsum("tbh,ho->tbo", xs[1].astype(jnp.float32),
                         aw[hidden:]) + ab)
    return xs[0], xs[1], logits


def _fused_stack_tm_impl(params, x: jnp.ndarray, block_b: int | None = None):
    pipe, block_b = _plan(x.shape[0], block_b)
    x_tm = _pad_rows(jnp.swapaxes(x, 0, 1).astype(jnp.bfloat16), block_b)
    return _run_stack(params, x_tm, block_b, pipe)


def _scan_halves(params, x):
    """Reference lax.scan stack; returns the final layer's direction halves
    (each (B, T, H) f32).  Used as the differentiation surrogate below."""
    from mmego_tpu.nn import lstm as lstm_mod

    out = x
    for layer in params:
        y_f, _ = lstm_mod._scan_direction(layer["fwd"], out, False, None, None)
        y_b, _ = lstm_mod._scan_direction(layer["bwd"], out, True, None, None)
        out = jnp.concatenate([y_f, y_b], axis=-1)
    return y_f, y_b


# The kernels carry no JVP/transpose rules, but callers legitimately
# differentiate through eval-mode forwards (e.g. stage-1 training runs the
# net with dropout 0 => train=False, Train_IMU.py:50).  custom_vjp makes
# that work: the PRIMAL pass keeps the fused kernels; the BACKWARD pass
# recomputes with the lax.scan stack and differentiates that.  Gradients are
# therefore the scan path's (f32) gradients -- self-consistent, and within
# bf16 storage noise of the kernel's forward.  (Forward-mode jvp of these
# entry points is unsupported, as with any custom_vjp.)

def _fused_stack_impl(params, x):
    y_f, y_b = _fused_stack_tm_impl(params, x)
    out = jnp.concatenate([y_f, y_b], axis=-1).astype(jnp.float32)
    return jnp.swapaxes(out, 0, 1)[: x.shape[0]]


@jax.custom_vjp
def fused_stack(params, x: jnp.ndarray) -> jnp.ndarray:
    """Whole stack with the nn.lstm interface: (B, T, F) -> (B, T, 2H) f32."""
    return _fused_stack_impl(params, x)


def _fused_stack_fwd(params, x):
    return _fused_stack_impl(params, x), (params, x)


def _fused_stack_bwd(res, g):
    params, x = res

    def ref(p, xx):
        y_f, y_b = _scan_halves(p, xx)
        return jnp.concatenate([y_f, y_b], axis=-1)

    _, vjp = jax.vjp(ref, params, x)
    return vjp(g.astype(jnp.float32))


fused_stack.defvjp(_fused_stack_fwd, _fused_stack_bwd)

# ---------------------------------------------------------------------------
# v3: software-pipelined direction (x-projection prefetched one step ahead)
# ---------------------------------------------------------------------------
#
# Profile finding (2026-08-17, demo shapes): the v2 fused kernels reach only
# ~48% of bf16 MXU peak.  Each grid step serialises
#   [x-dots (MXU, ~11 us) -> h-dot (MXU, ~5 us) -> gate chain (VPU, ~12 us)]
# and the VPU transcendentals idle the MXU.  v3 rotates the x-projection one
# grid step ahead: step s consumes the projection computed at s-1 from a VMEM
# scratch accumulator and computes the NEXT step's projection after the
# recurrent dot -- independent of the gate chain, so Mosaic can overlap the
# two.  Critical path per step drops to h-dot + max(x-dots, VPU).
#
# The grid runs T+1 steps per batch block: step 0 only primes the scratch
# (x tile index map is min(s, T-1); the final step's fetch is a dead read),
# and the output index map lags one step (max(s-1, 0); step 0's skipped
# write is legal -- the same out block is revisited and fully written at
# step 1 before the pipeline emits it).


def _fused_pipe_kernel(*refs, n_in: int, hidden: int, steps: int,
                       attn: bool = False):
    xs = refs[:n_in]
    wis = refs[n_in:2 * n_in]
    if attn:
        (wh_ref, b_ref, aw_ref, o_ref, l_out_ref,
         xg_ref, h_ref, c_ref, l_ref) = refs[2 * n_in:]
    else:
        wh_ref, b_ref, o_ref, xg_ref, h_ref, c_ref = refs[2 * n_in:]
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)
        if attn:
            l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(s > 0)
    def _():
        gates = b_ref[:] + xg_ref[:] + jnp.dot(
            h_ref[:].astype(jnp.bfloat16), wh_ref[:],
            preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c = f * c_ref[:] + i * g
        h = o * jnp.tanh(c)
        h_ref[:] = h
        c_ref[:] = c
        o_ref[0] = h.astype(o_ref.dtype)
        if attn:
            # this direction's share of the attention-pool logit: one extra
            # (BB, H) @ (H, 1) dot per step, accumulated into a (BB, 128)
            # scratch time-matrix (one-hot column select -- a lane-1 output
            # stream per step measured SLOWER) and emitted once per block.
            # Saves the post-hoc read pass over the stack output.  Numerics
            # track the v2 post-hoc einsum exactly: h rounded to bf16 (v2
            # reads the bf16 stack output) then a f32 dot with the f32 pool
            # weight (r3 shipped a bf16 aw here, giving batch-size-dependent
            # logits across paths -- the (H, 1) dot is VPU-negligible, so
            # f32 costs nothing).
            contrib = jnp.dot(
                h.astype(jnp.bfloat16).astype(jnp.float32), aw_ref[:],
                preferred_element_type=jnp.float32)  # (BB, 1)
            col = (jax.lax.broadcasted_iota(jnp.int32, (1, LOGIT_LANES), 1)
                   == s - 1).astype(jnp.float32)
            l_ref[:] = l_ref[:] + contrib * col

    if attn:
        @pl.when(s == steps)
        def _():
            l_out_ref[0] = l_ref[:]

    @pl.when(s < steps)
    def _():
        xg = jnp.dot(xs[0][0], wis[0][:], preferred_element_type=jnp.float32)
        for x_ref, wi_ref in zip(xs[1:], wis[1:]):
            xg = xg + jnp.dot(x_ref[0], wi_ref[:],
                              preferred_element_type=jnp.float32)
        xg_ref[:] = xg


def _fused_pipe_direction(p: dict, xs, reverse: bool, block_b: int,
                          attn_w: jnp.ndarray | None = None):
    """v3 pipelined counterpart of _fused_direction (same contract).

    With ``attn_w`` ((H, 1) f32): also returns this direction's per-step
    attention logits (T, BP, 1) f32 computed in-kernel from the fresh h.
    """
    t, bp, _ = xs[0].shape
    hidden = p["wh"].shape[0]
    nb = bp // block_b

    wi = p["wi"].astype(jnp.bfloat16)
    wi_parts, off = [], 0
    for x in xs:
        wi_parts.append(wi[off:off + x.shape[2]])
        off += x.shape[2]
    wh = p["wh"].astype(jnp.bfloat16)
    b = p["b"].astype(jnp.float32).reshape(1, 4 * hidden)

    if reverse:
        xix = lambda i, s: (t - 1 - jnp.minimum(s, t - 1), i, 0)
        oix = lambda i, s: (t - 1 - jnp.maximum(s - 1, 0), i, 0)
    else:
        xix = lambda i, s: (jnp.minimum(s, t - 1), i, 0)
        oix = lambda i, s: (jnp.maximum(s - 1, 0), i, 0)
    resident = lambda i, s: (0, 0)

    in_specs = [
        pl.BlockSpec((1, block_b, x.shape[2]), xix, memory_space=pltpu.VMEM)
        for x in xs
    ] + [
        pl.BlockSpec(w.shape, resident, memory_space=pltpu.VMEM)
        for w in wi_parts
    ] + [
        pl.BlockSpec(wh.shape, resident, memory_space=pltpu.VMEM),
        pl.BlockSpec(b.shape, resident, memory_space=pltpu.VMEM),
    ]
    operands = [*xs, *wi_parts, wh, b]
    out_specs = pl.BlockSpec((1, block_b, hidden), oix,
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((t, bp, hidden), jnp.bfloat16)
    scratch = [
        pltpu.VMEM((block_b, 4 * hidden), jnp.float32),
        pltpu.VMEM((block_b, hidden), jnp.float32),
        pltpu.VMEM((block_b, hidden), jnp.float32),
    ]
    if attn_w is not None:
        if t > LOGIT_LANES:   # not assert: -O would silently zero logits
            raise ValueError(
                f"in-kernel logit scratch holds {LOGIT_LANES} steps, got {t}")
        in_specs.append(pl.BlockSpec((hidden, 1), resident,
                                     memory_space=pltpu.VMEM))
        operands.append(attn_w.astype(jnp.float32))
        # per-block (BB, 128) logit time-matrix, emitted once per block
        out_specs = [out_specs,
                     pl.BlockSpec((1, block_b, LOGIT_LANES),
                                  lambda i, s: (i, 0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((nb, block_b, LOGIT_LANES),
                                          jnp.float32)]
        scratch.append(pltpu.VMEM((block_b, LOGIT_LANES), jnp.float32))

    out = pl.pallas_call(
        functools.partial(_fused_pipe_kernel, n_in=len(xs), hidden=hidden,
                          steps=t, attn=attn_w is not None),
        grid=(nb, t + 1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(*operands)
    if attn_w is None:
        return out
    y, lmat = out
    # (nb, BB, 128) time-matrix -> (T, BP, 1) logits; ~10 MB of reshuffle.
    # The forward direction fills column s-1 with step s's logit, i.e.
    # column j = logit of output step j; the REVERSED direction's step s
    # writes output t-1-(s-1), so column j = logit of output step t-1-j.
    logits = jnp.swapaxes(lmat.reshape(bp, LOGIT_LANES)[:, :t], 0, 1)
    if reverse:
        logits = logits[::-1]
    return y, logits[..., None]


def _fused_stack_tm_pipe_impl(params, x: jnp.ndarray, block_b: int = 448):
    """v3 stack, pipe forced on: block-size sweeps and interpret tests."""
    block_b = min(block_b, _round_up(x.shape[0], 8))
    x_tm = _pad_rows(jnp.swapaxes(x, 0, 1).astype(jnp.bfloat16), block_b)
    return _run_stack(params, x_tm, block_b, pipe=True)


def preferred_block() -> int:
    """Batch block the stack entry points will use for LARGE batches
    (env-dependent); callers pre-padding their input (imu_net's fc1) align
    to this so the kernel entry's _pad_rows is a no-op."""
    import os
    return 448 if os.environ.get("MMEGO_LSTM_PIPE", "1") == "1" else BLOCK_B


def _fused_stack_tm_pre_impl(params, x_tm: jnp.ndarray):
    """Stack over an ALREADY time-major (T, BP, F) input (no attn)."""
    pipe, block_b = _plan(x_tm.shape[1])
    return _run_stack(params, _pad_rows(x_tm, block_b), block_b, pipe)


def _fused_stack_tm_attn_impl(params, x_tm, aw, ab):
    pipe, block_b = _plan(x_tm.shape[1])
    return _run_stack(params, _pad_rows(x_tm, block_b), block_b, pipe,
                      attn=(aw, ab))


@jax.custom_vjp
def fused_stack_tm_attn(params, x_tm, aw, ab):
    """Stack + in-kernel attention logits over a TIME-MAJOR input.

    Callers that can produce their input in this layout (the IMU net's fc1,
    whose 15-feature INPUT is cheap to transpose before the matmul) skip
    the (B*, T, 4H-wide) transpose + pad + cast copies the batch-major
    interface would materialise (~2 ms at demo shapes).  Rows beyond the
    true batch may be arbitrary garbage: they stay confined to their own
    recurrence rows and callers slice them off.  The attention-pool logits
    ``y_concat @ aw + ab`` are computed inside the last layer's kernels on
    the pipe path (the logit dot rides each step's fresh h in VMEM;
    computing it post-hoc costs a full HBM read pass over both halves).

    Args:
      aw: (2H, 1) f32 pool weights (fwd-half rows first, matching the
          concat layout the batch-major interface would produce); ab: (1,).
    Returns:
      (y_fwd, y_bwd, logits): (T, BP', H) bf16 x2 and (T, BP', 1) f32,
      BP' = input rows padded to the batch block.
    """
    return _fused_stack_tm_attn_impl(params, x_tm, aw, ab)


def _fused_stack_tm_attn_fwd(params, x_tm, aw, ab):
    return (_fused_stack_tm_attn_impl(params, x_tm, aw, ab),
            (params, x_tm, aw, ab))


def _fused_stack_tm_attn_bwd(res, cts):
    params, x_tm, aw, ab = res
    g_f, g_b, g_l = cts
    hidden = params[-1]["fwd"]["wh"].shape[0]

    def ref(p, xt, aw_, ab_):
        y_f, y_b = _scan_halves(p, jnp.swapaxes(xt, 0, 1).astype(jnp.float32))
        y_f = jnp.swapaxes(y_f, 0, 1)
        y_b = jnp.swapaxes(y_b, 0, 1)
        logits = (jnp.einsum("tbh,ho->tbo", y_f, aw_[:hidden]) +
                  jnp.einsum("tbh,ho->tbo", y_b, aw_[hidden:]) + ab_)
        return y_f, y_b, logits

    _, vjp = jax.vjp(ref, params, x_tm, aw, ab)
    bp = x_tm.shape[1]
    return vjp((g_f[:, :bp].astype(jnp.float32),
                g_b[:, :bp].astype(jnp.float32),
                g_l[:, :bp].astype(jnp.float32)))


fused_stack_tm_attn.defvjp(_fused_stack_tm_attn_fwd, _fused_stack_tm_attn_bwd)


# ---------------------------------------------------------------------------
# v4 (dual-direction layer kernel): MEASURED AND REMOVED (round 4)
# ---------------------------------------------------------------------------
#
# Hypothesis: within one grid step the dependency chain
# [h-dot -> gate VPU -> next h-dot] serialises the MXU and VPU; running the
# forward and REVERSED recurrences of one layer in a single kernel body
# gives the scheduler two independent chains to interleave.  Measured on
# the fast-stack shapes (scripts/lstm_kernel_bench.py, 2026-08-20, v5e):
# v4 dual layer-1 + v3 layer-2 hybrid 45.12 ms vs shipped v3 45.06 ms and
# v2@448 44.82 ms -- no win (the doubled weight residency also caps it at
# F <= 512 layers, so layer 2 could never use it).  The kernel was deleted
# with this note per the measure-or-delete rule; recover it from git
# history (`git log -S _dual_direction_layer`) if larger shapes revisit
# the idea.
