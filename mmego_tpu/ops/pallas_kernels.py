"""Hand-written Pallas TPU kernels for the cascade's named hot ops.

Two ops get custom kernels (with jnp fallbacks that XLA fuses well; the
kernels are opt-in via ``use_pallas`` or the MMEGO_PALLAS env var):

* ``gcn_contract`` -- the ST-GCN graph contraction
  ``einsum('nkctv,kvw->nctw', x, A)`` (reference GCN.py:62).  The joint axis
  (V = 15) is far below the 128-lane tile, so the kernel pads V once, keeps
  the tiny adjacency resident in VMEM across the whole batch grid, and runs
  one (C*T, V) x (V, V) MXU matmul per partition slice, accumulating in a
  float32 scratch.

* ``attn_pool`` -- masked softmax attention pooling over the point axis
  (reference Upper_Net.py:299-301): logits -> stable softmax -> weighted sum,
  fused into a single VMEM-resident pass instead of four HBM round trips.

Both kernels are grid-parallel over the flattened batch; blocks are sized to
the actual model shapes (N <= 128 points, C <= 64 features), which fit VMEM
with huge margin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_pallas_default(op: str) -> bool:
    from mmego_tpu.ops import pallas_ctl
    return pallas_ctl.enabled(op)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# GCN graph contraction
# ---------------------------------------------------------------------------

def _gcn_kernel(x_ref, a_ref, o_ref, acc_ref, *, k: int):
    """One batch element: o[ct, w] = sum_k x[k, ct, :] @ a[k, :, w]."""
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for ki in range(k):  # K is 1-3: unrolled, both operands stay in VMEM
        acc_ref[:] += jnp.dot(x_ref[0, ki], a_ref[ki],
                              preferred_element_type=jnp.float32)
    o_ref[0] = acc_ref[:].astype(o_ref.dtype)


def gcn_contract(x: jnp.ndarray, a: jnp.ndarray,
                 use_pallas: bool | None = None) -> jnp.ndarray:
    """einsum('nkctv,kvw->nctw', x, a).

    Args:
      x: (N, K, C, T, V); a: (K, V, V).
    """
    if use_pallas is None:
        use_pallas = _use_pallas_default("gcn")
    if not use_pallas:
        return jnp.einsum("nkctv,kvw->nctw", x, a)

    n, k, c, t, v = x.shape
    vp = _round_up(v, 128)
    ctp = _round_up(c * t, 8)
    xp = jnp.zeros((n, k, ctp, vp), x.dtype)
    xp = xp.at[:, :, : c * t, :v].set(x.reshape(n, k, c * t, v))
    ap = jnp.zeros((k, vp, vp), a.dtype)
    ap = ap.at[:, :v, :v].set(a)

    out = pl.pallas_call(
        functools.partial(_gcn_kernel, k=k),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, k, ctp, vp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, vp, vp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ctp, vp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ctp, vp), x.dtype),
        scratch_shapes=[pltpu.VMEM((ctp, vp), jnp.float32)],
    )(xp, ap)
    return out[:, : c * t, :v].reshape(n, c, t, v)


# ---------------------------------------------------------------------------
# Attention pooling (softmax over the point axis, then weighted sum)
# ---------------------------------------------------------------------------

def _attn_pool_kernel(x_ref, w_ref, b_ref, n_ref, o_ref):
    """One batch row: out[c] = sum_n softmax_n(x @ w + b)[n] * x[n, c].
    Rows >= n_real are alignment padding and are masked out of the softmax."""
    x = x_ref[0]                                   # (Np, Cp)
    logits = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
    logits = jnp.sum(logits, axis=1, keepdims=True) + b_ref[0, 0]  # (Np, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    logits = jnp.where(row < n_ref[0, 0], logits, -jnp.inf)
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - m)
    w = e / jnp.sum(e, axis=0, keepdims=True)
    o_ref[0, 0] = jnp.sum(x * w, axis=0).astype(o_ref.dtype)


def attn_pool(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
              use_pallas: bool | None = None) -> jnp.ndarray:
    """softmax(x @ w + b, axis=-2)-weighted sum of x over the point axis.

    Args:
      x: (..., N, C) features; w: (C, 1); b: (1,).
    Returns:
      (..., C).
    """
    if use_pallas is None:
        use_pallas = _use_pallas_default("attn")
    if not use_pallas:
        logits = x @ w + b
        weights = jax.nn.softmax(logits, axis=-2)
        return jnp.sum(x * weights, axis=-2)

    batch_shape = x.shape[:-2]
    n, c = x.shape[-2:]
    nb = 1
    for d in batch_shape:
        nb *= d
    np_, cp = _round_up(n, 8), _round_up(c, 128)
    xp = jnp.zeros((nb, np_, cp), x.dtype).at[:, :n, :c].set(
        x.reshape(nb, n, c))
    # Padded rows must not attract softmax mass: their logits are handled by
    # padding w to produce x@w = 0 there, then masking via -inf bias rows.
    wp = jnp.zeros((cp, 128), w.dtype).at[:c, 0].set(w[:, 0])
    bp = jnp.asarray(b, jnp.float32).reshape(1, 1)
    nr = jnp.asarray([[n]], jnp.int32)

    out = pl.pallas_call(
        _attn_pool_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, np_, cp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        # out is (nb, 1, cp) so the block's trailing dims (1, cp) equal the
        # array's -- a (1, cp) block on a (nb, cp) array violates the TPU
        # (8, 128)-divisibility rule.
        out_specs=pl.BlockSpec((1, 1, cp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 1, cp), x.dtype),
    )(xp, wp, bp, nr)
    return out[:, 0, :c].reshape(*batch_shape, c)


# ---------------------------------------------------------------------------
# Cross-attention column sum (LowerNet fusion, reference Lower_Net.py:104-113)
# ---------------------------------------------------------------------------
#
# The fusion module consumes ONLY the column sum of the per-window softmax
# attention contracted with V (models/lower_net.py:104-122).  Per window the
# math is 16,700 independent (64,64)@(64,15) matmuls -- far below MXU tile
# size, and XLA runs the batched form at <1% MXU utilisation (~3 ms in situ).
# Blocking G windows into ONE (G*64, C)@(C, G*Mp) masked matmul recovers MXU
# shape at a G-fold FLOP waste; the (G*64, G*Mp) score tile lives and dies in
# VMEM (the same rewrite expressed in XLA materialises it to HBM and measures
# SLOWER than the batched einsum -- 5.5-30 ms for G=4..100).
#
# MEASURED IN SITU (v5e, demo batch, 2026-08-17): lower stage 16.5 ms with
# this kernel (G=16) vs 15.2 ms with the XLA batched einsum -- the G-fold
# score waste (~0.5 GFLOP extra at G=16) plus per-step grid overhead loses
# to XLA's bandwidth-bound einsum at these shapes, so the default is OFF
# (pallas_ctl._OP_DEFAULT_ON['xattn']).  The kernel is kept parity- and
# grad-tested for regimes with wider windows (N, M >~ 128) where the MXU
# shape recovery pays.

def _g_windows() -> int:
    """Windows blocked per kernel invocation; read per trace (not at
    import) so sweeps/tests can flip MMEGO_XATTN_G in-process."""
    import os
    return int(os.environ.get("MMEGO_XATTN_G", "16"))


def _xattn_kernel(q_ref, k_ref, v_ref, o_ref, *, n: int, m: int, mp: int,
                  g: int, scale: float):
    """One block of g windows.

    q_ref: (1, g*n, C) bf16; k_ref: (1, g*mp, C) bf16 (zero rows m..mp);
    v_ref: (1, g*mp, Cv) f32; o_ref: (1, g, Cv).
    """
    # contract C with C (transposed-rhs matmul, MXU-native; avoids an XLA
    # transpose of k on the host side of the call)
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // n
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    valid = (rows == cols // mp) & (cols % mp < m)
    s = jnp.where(valid, s, -jnp.inf)
    e = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
    # normalise via reciprocal-multiply: one divide per ROW instead of a
    # full-matrix divide (VPU divides are multi-cycle)
    w = e * (1.0 / jnp.sum(e, axis=1, keepdims=True))  # (g*n, g*mp)
    colw = jnp.sum(w, axis=0)                          # (g*mp,)
    wv = colw[:, None] * v_ref[0]                      # (g*mp, Cv) f32
    o_ref[0] = jnp.sum(wv.reshape(g, mp, v_ref.shape[-1]), axis=1)


def _xattn_fallback(q, k, v, scale):
    attn = jax.nn.softmax(jnp.einsum("bnc,bmc->bnm", q, k) * scale, axis=-1)
    col = jnp.sum(attn, axis=-2)
    return jnp.einsum("bm,bmc->bc", col, v)


def _xattn_impl(q, k, v, scale):
    b, n, c = q.shape
    m, cv = k.shape[-2], v.shape[-1]
    g = _g_windows()
    mp = _round_up(m, 8)
    bp = _round_up(b, g)
    if bp != b:
        pad = ((0, bp - b), (0, 0), (0, 0))
        # Padded windows are harmless: all-zero q/k give a uniform softmax
        # over the mp-masked columns and v=0 makes the output row zero.
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    nb = bp // g
    qb = q.astype(jnp.bfloat16).reshape(nb, g * n, c)
    kb = jnp.pad(k.astype(jnp.bfloat16),
                 ((0, 0), (0, mp - m), (0, 0))).reshape(nb, g * mp, c)
    vb = jnp.pad(v, ((0, 0), (0, mp - m), (0, 0))).reshape(nb, g * mp, cv)

    out = pl.pallas_call(
        functools.partial(_xattn_kernel, n=n, m=m, mp=mp, g=g,
                          scale=float(scale)),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, g * n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * mp, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * mp, cv), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, cv), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, g, cv), v.dtype),
    )(qb, kb, vb)
    return out.reshape(bp, cv)[:b]


# scale is static (nondiff_argnums): it reaches the kernel as a Python float
# baked into the trace, matching the model's compile-time 1/sqrt(C).
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _xattn_pallas(q, k, v, scale):
    return _xattn_impl(q, k, v, scale)


def _xattn_fwd(q, k, v, scale):
    return _xattn_impl(q, k, v, scale), (q, k, v)


def _xattn_bwd(scale, res, gout):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _xattn_fallback(q, k, v, scale), q, k, v)
    return vjp(gout.astype(q.dtype))


_xattn_pallas.defvjp(_xattn_fwd, _xattn_bwd)


def cross_attn_colsum(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      scale: float,
                      use_pallas: bool | None = None) -> jnp.ndarray:
    """(sum over queries of softmax(q @ k^T * scale)) @ v, per window.

    Args:
      q: (B, N, C) queries; k: (B, M, C) keys; v: (B, M, Cv) values.
    Returns:
      (B, Cv): the attention column-sum contracted with v -- everything the
      LowerNet fusion consumes of its cross-attention.
    """
    if use_pallas is None:
        use_pallas = _use_pallas_default("xattn")
    if not use_pallas:
        return _xattn_fallback(q, k, v, scale)
    return _xattn_pallas(q, k, v, scale)
