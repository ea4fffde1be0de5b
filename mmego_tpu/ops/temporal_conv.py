"""ST-GCN temporal conv as one dense MXU matmul.

The reference's temporal unit is a Conv2d with kernel (9, 1) over the
(T=20, V=15) plane (``Net/GCN.py:108-136``).  On TPU those spatial dims are
far below the (8, 128) tile, so XLA's conv lowering tiles poorly at this
model's shapes.  With T static and tiny, the same-padded temporal conv is
exactly a banded linear operator on the flattened (C, T) axis:

    y[n, o, t_out, v] = sum_{c, t_in} x[n, c, t_in, v] * B[c t_in, o t_out]
    B[c t_in, o t_out] = w[o, c, t_in - t_out + pad]   (0 where out of band)

i.e. ONE dense (N*V, C*T) @ (C*T, O*T) matmul -- M and K/N all MXU-aligned
at the model's shapes (N*V = 12,525; C*T up to 2,560).  The band wastes
T/k = 20/9 = 2.2x the conv's FLOPs in exchange for dense-matmul tiling.

MEASURED (docs/PERFORMANCE.md): at T=20/k=9 the trade LOSES -- XLA's conv
lowering runs the whole lower stage in 11.4 ms vs 12.9 ms with this path,
so the 'tcn' switch defaults OFF.  The formulation wins only when T >> k
amortises the band overhead; it ships parity- and gradient-tested
(tests/test_temporal_conv.py) as the documented alternative lowering.

``banded_weights`` is differentiable (gather + mask), so the formulation is
valid in training too; the trainers keep the conv lowering for bit-parity
with recorded BN statistics.
"""

from __future__ import annotations

import jax.numpy as jnp


def banded_weights(w: jnp.ndarray, t: int) -> jnp.ndarray:
    """(O, C, k, 1) conv weights -> (C*T, O*T) banded operator."""
    w = w[..., 0]                                  # (O, C, k)
    o, c, k = w.shape
    pad = k // 2
    d = jnp.arange(t)[:, None] - jnp.arange(t)[None, :] + pad   # (T_in, T_out)
    valid = (d >= 0) & (d < k)
    band = w[:, :, jnp.clip(d, 0, k - 1)] * valid[None, None]   # (O, C, T, T)
    return band.transpose(1, 2, 0, 3).reshape(c * t, o * t)


def temporal_conv_matmul(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Same-padded temporal conv.  x: (N, C, T, V) -> (N, O, T, V)."""
    n, c, t, v = x.shape
    op = banded_weights(p["w"], t)                 # (C*T, O*T)
    o = p["w"].shape[0]
    xm = x.transpose(0, 3, 1, 2).reshape(n * v, c * t)
    y = (xm @ op).reshape(n, v, o, t).transpose(0, 2, 3, 1)
    return y + p["b"][None, :, None, None]
