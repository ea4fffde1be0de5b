"""Functional NN layers: Linear, pointwise conv (= matmul), BatchNorm.

Design: plain pytrees of arrays + pure ``init``/``apply`` functions, no module
framework.  Parameters are stored **right-multiply** style (``y = x @ w + b``,
w: (in, out)) so every layer lowers to a single MXU matmul over whatever batch
dims the caller flattens in; the torch-importer transposes accordingly.

Pointwise semantics: the reference implements its per-point MLPs as
``nn.Conv1d(kernel_size=1)`` over (B, C, N) (e.g. ``Net/Upper_Net.py:242-268``)
-- mathematically a Linear applied at every point, which is exactly what
``linear_apply`` on (B, N, C) is.  No transposes needed on TPU.

BatchNorm reproduces torch semantics bit-for-bit where it matters:
eps 1e-5, momentum 0.1, batch statistics over all non-feature axes, *biased*
variance for normalisation but *unbiased* variance folded into the running
average, running stats used verbatim in eval (needed for checkpoint parity).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Linear / pointwise conv
# ---------------------------------------------------------------------------

def linear_init(rng, in_features: int, out_features: int) -> dict:
    """Uniform(+-1/sqrt(fan_in)) init, matching torch Linear/Conv1d defaults."""
    kw, kb = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_features, jnp.float32))
    return {
        "w": jax.random.uniform(kw, (in_features, out_features), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (out_features,), jnp.float32, -bound, bound),
    }


def linear_apply(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


# ---------------------------------------------------------------------------
# BatchNorm (feature axis = last)
# ---------------------------------------------------------------------------

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def bn_init(num_features: int) -> Tuple[dict, dict]:
    params = {
        "scale": jnp.ones((num_features,), jnp.float32),
        "bias": jnp.zeros((num_features,), jnp.float32),
    }
    state = {
        "mean": jnp.zeros((num_features,), jnp.float32),
        "var": jnp.ones((num_features,), jnp.float32),
    }
    return params, state


def bn_apply(p: dict, s: dict, x: jnp.ndarray, train: bool,
             axis: int = -1) -> Tuple[jnp.ndarray, dict]:
    """Normalise over every axis except ``axis`` (the feature/channel axis).

    Returns (y, new_state); new_state is ``s`` unchanged in eval mode.
    """
    axis = axis % x.ndim
    reduce_axes = tuple(a for a in range(x.ndim) if a != axis)
    bshape = [1] * x.ndim
    bshape[axis] = x.shape[axis]
    if train:
        mean = jnp.mean(x, axis=reduce_axes)
        var = jnp.var(x, axis=reduce_axes)
        n = x.size // x.shape[axis]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * s["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_state = s
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (x - mean.reshape(bshape)) * (inv * p["scale"]).reshape(bshape) \
        + p["bias"].reshape(bshape)
    return y, new_state


# ---------------------------------------------------------------------------
# Conv blocks used by the point nets: linear -> BN -> ReLU
# ---------------------------------------------------------------------------

def conv_bn_relu_init(rng, in_f: int, out_f: int) -> Tuple[dict, dict]:
    lin = linear_init(rng, in_f, out_f)
    bnp, bns = bn_init(out_f)
    return {"lin": lin, "bn": bnp}, {"bn": bns}


def conv_bn_relu_apply(p: dict, s: dict, x: jnp.ndarray, train: bool) -> Tuple[jnp.ndarray, dict]:
    y = linear_apply(p["lin"], x)
    y, bns = bn_apply(p["bn"], s["bn"], y, train)
    return jax.nn.relu(y), {"bn": bns}


# ---------------------------------------------------------------------------
# Attention pooling over an axis (softmax(Linear(x)) weighted sum)
# ---------------------------------------------------------------------------

def attn_pool_init(rng, features: int) -> dict:
    return {"attn": linear_init(rng, features, 1)}


def attn_pool_apply(p: dict, x: jnp.ndarray, axis: int = -2,
                    normalized: bool = True, train: bool = False) -> jnp.ndarray:
    """softmax-weighted sum over ``axis``.

    ``normalized=True`` is the GlobalPointNet/IMU pooling
    (softmax over the point/sample axis, Upper_Net.py:299-301, IMU_Net.py:82-83).
    ``normalized=False`` reproduces the FusionModule quirk
    (Lower_Net.py:89-90,112-113): its Softmax(dim=-1) acts on a singleton axis,
    so every weight is exactly 1.0 and the "attention pool" degenerates to a
    plain sum -- kept for checkpoint parity.
    """
    if normalized and axis == -2 and not train:
        # Routed through ops/pallas_kernels.attn_pool: jnp fallback by
        # default, hand-written fused kernel when MMEGO_PALLAS=1.  The kernel
        # defines no VJP, hence the ``not train`` gate.
        from mmego_tpu.ops import pallas_kernels
        return pallas_kernels.attn_pool(x, p["attn"]["w"], p["attn"]["b"])
    logits = linear_apply(p["attn"], x)                # (..., N, 1)
    if normalized:
        w = jax.nn.softmax(logits, axis=axis)
    else:
        w = jnp.ones_like(logits)
    return jnp.sum(x * w, axis=axis)


# ---------------------------------------------------------------------------
# 2-D convolution wrapper (NCHW, torch weight layout) for the ST-GCN temporal
# convs; kernel sizes are (k, 1) so this is a 1-D conv over time per joint.
# ---------------------------------------------------------------------------

def conv2d_init(rng, in_ch: int, out_ch: int, kh: int, kw: int) -> dict:
    k1, k2 = jax.random.split(rng)
    fan_in = in_ch * kh * kw
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    return {
        "w": jax.random.uniform(k1, (out_ch, in_ch, kh, kw), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (out_ch,), jnp.float32, -bound, bound),
    }


def conv2d_apply(p: dict, x: jnp.ndarray, padding=((0, 0), (0, 0)),
                 stride=(1, 1)) -> jnp.ndarray:
    """x: (N, C, H, W) -> (N, C_out, H', W') with torch-layout weights."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride, padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["b"][None, :, None, None]
