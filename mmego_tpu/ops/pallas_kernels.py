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
