"""Multi-layer bidirectional LSTM via ``lax.scan``, cuDNN-compatible.

The reference leans on ``nn.LSTM`` everywhere (IMU fast/slow stacks,
``Net/IMU_Net.py:58-62``; the 3-layer bi-LSTMs of the upper/lower nets,
``Net/Upper_Net.py:333`` and ``Net/Lower_Net.py:91-93``).  This module is the
TPU-native equivalent:

* The input projection for **all** timesteps is hoisted out of the recurrence
  into one large ``(B*T, in) @ (in, 4H)`` matmul (MXU-friendly); the scan body
  only does the ``(B, H) @ (H, 4H)`` hidden matmul plus fused element-wise
  gates, which is the minimum serial work an LSTM admits.
* Gate order is cuDNN/torch's (i, f, g, o) and both bias vectors are kept
  (summed at fold-in time), so torch checkpoints import losslessly.
* Bidirectional = a flipped second scan; layers stack with concatenated
  fwd/bwd outputs and optional inter-layer dropout (torch semantics: applied
  to every layer's output except the last, train-time only).

Parameter pytree: ``[{"fwd": {"wi","wh","b"}, "bwd": {...}}, ...]`` with
``wi: (in, 4H)``, ``wh: (H, 4H)``, ``b: (4H,)`` (right-multiply layout).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

# Matmul precision for the recurrence.  Standard bf16 MXU passes by default:
# the kernel-vs-scan deviation attributable to bf16 storage/weights is
# 9.1e-3 m worst-case per joint and 0.0009 cm on the probe-set mean
# (selfcheck.kernel_crosscheck, round-3 weights) at ~2x the speed.  The
# TPU-vs-CPU deviation is larger (3.6e-2 m) but is NOT a precision artifact:
# it is unchanged under precision=highest with kernels off -- chaotic
# amplification of ambient cross-backend differences; the selfcheck gates
# the demo-set mean instead.  Override with
# MMEGO_LSTM_PRECISION={default,float32,highest} when accuracy-auditing.
_PRECISION = os.environ.get("MMEGO_LSTM_PRECISION", "default")
if _PRECISION == "default":
    _PRECISION = None

# ops/pallas_ctl decides (at trace time) whether inference recurrences route
# through the hand-written Pallas kernels (ops/pallas_lstm.fused_stack:
# whole stack fused, weights VMEM-resident, bf16 storage).  Default: on for
# the TPU backend, off elsewhere; MMEGO_PALLAS=0/1 overrides.  Forward-only
# -- training paths (train=True or under grad) keep the scan; so do
# f32/highest precision audits (the kernel's storage precision is fixed).


def _direction_init(rng, in_f: int, hidden: int) -> dict:
    k1, k2, k3 = jax.random.split(rng, 3)
    bound = 1.0 / jnp.sqrt(jnp.asarray(hidden, jnp.float32))
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -bound, bound)
    return {
        "wi": u(k1, (in_f, 4 * hidden)),
        "wh": u(k2, (hidden, 4 * hidden)),
        # torch keeps separate b_ih/b_hh, both init U(+-1/sqrt(H)); their sum
        # is what the cell sees, so we store one vector drawn as a sum.
        "b": u(k3, (4 * hidden,)) + u(jax.random.fold_in(k3, 1), (4 * hidden,)),
    }


def lstm_init(rng, input_size: int, hidden: int, num_layers: int,
              bidirectional: bool = True) -> List[dict]:
    layers = []
    dirs = 2 if bidirectional else 1
    for layer in range(num_layers):
        in_f = input_size if layer == 0 else hidden * dirs
        rng, kf, kb = jax.random.split(rng, 3)
        entry = {"fwd": _direction_init(kf, in_f, hidden)}
        if bidirectional:
            entry["bwd"] = _direction_init(kb, in_f, hidden)
        layers.append(entry)
    return layers


def _scan_direction(p: dict, x: jnp.ndarray, reverse: bool,
                    h0: Optional[jnp.ndarray], c0: Optional[jnp.ndarray]
                    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One direction of one layer.  x: (B, T, F) -> (B, T, H)."""
    b, t, _ = x.shape
    hidden = p["wh"].shape[0]
    xp = jnp.einsum("btf,fg->btg", x, p["wi"], precision=_PRECISION) + p["b"]
    xp = jnp.swapaxes(xp, 0, 1)                         # time-major (T, B, 4H)

    h = jnp.zeros((b, hidden), x.dtype) if h0 is None else h0
    c = jnp.zeros((b, hidden), x.dtype) if c0 is None else c0
    wh = p["wh"]

    def step(carry, gates_x):
        h, c = carry
        gates = gates_x + jnp.einsum("bh,hg->bg", h, wh, precision=_PRECISION)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    # The reversed direction runs the SAME scan with reverse=True -- outputs
    # land in original time positions, no data flips.  (jnp.flip on multi-GB
    # tensors silently corrupts values on the tunneled TPU backend: measured
    # 0.91 max error on the flipped direction at 16700x20x2048 while the
    # unflipped direction was bit-exact.  See tests/test_lstm.py
    # ::test_lstm_batch_invariance.)
    (h, c), ys = jax.lax.scan(step, (h, c), xp, reverse=reverse)
    ys = jnp.swapaxes(ys, 0, 1)                         # back to (B, T, H)
    return ys, (h, c)


# NOTE: a single-scan bidirectional variant (direction-batched
# (2, B, H) x (2, H, 4H) dot_general) was built and REJECTED: the batched
# matmul is batch-size unstable on this backend (the recurrence amplifies the
# reassociated K-reduction to ~0.3 abs after 20 steps).  Per-direction 2-D
# matmuls are bit-stable and are what ships -- see docs/PERFORMANCE.md
# ("Backend numerics audit") and tests/test_lstm.py::test_lstm_batch_invariance.


def lstm_apply(params: List[dict], x: jnp.ndarray,
               dropout: float = 0.0, rng=None, train: bool = False
               ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Run the full stack.

    Args:
      x: (B, T, F) batch-first input (torch ``batch_first=True``).
    Returns:
      (outputs (B, T, dirs*H),
       (h_n, c_n) each (num_layers*dirs, B, H) in torch's layer-major,
       fwd-then-bwd order -- the reference allocates but never consumes these).
    """
    from mmego_tpu.ops import pallas_ctl
    use_pallas = (pallas_ctl.enabled("lstm") and not train and _PRECISION is None
                  and all("bwd" in layer for layer in params))
    if use_pallas:
        # kernel path: final h/c are not materialised (never consumed by the
        # reference architecture); zero placeholders keep the API.
        from mmego_tpu.ops import pallas_lstm
        out = pallas_lstm.fused_stack(params, x)
        hidden = params[0]["fwd"]["wh"].shape[0]
        zero = jnp.zeros((2 * len(params), x.shape[0], hidden), x.dtype)
        return out, (zero, zero)

    hs, cs = [], []
    out = x
    last = len(params) - 1
    for li, layer in enumerate(params):
        if "bwd" in layer:
            y_f, (h_f, c_f) = _scan_direction(layer["fwd"], out, False, None, None)
            y_b, (h_b, c_b) = _scan_direction(layer["bwd"], out, True, None, None)
            out = jnp.concatenate([y_f, y_b], axis=-1)
            hs += [h_f, h_b]
            cs += [c_f, c_b]
        else:
            out, (h_f, c_f) = _scan_direction(layer["fwd"], out, False, None, None)
            hs.append(h_f)
            cs.append(c_f)
        if train and dropout > 0.0 and li != last:
            rng, sub = jax.random.split(rng)
            keep = 1.0 - dropout
            mask = jax.random.bernoulli(sub, keep, out.shape)
            out = jnp.where(mask, out / keep, 0.0)
    return out, (jnp.stack(hs), jnp.stack(cs))
