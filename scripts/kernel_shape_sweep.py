"""Shape-sweep microbench: Pallas ``gcn_contract`` / ``attn_pool`` vs XLA.

Settles the per-op kernel defaults with DATA instead of argument
(ops/pallas_ctl._OP_DEFAULT_ON): for each shape in a grid spanning the
model's own sizes up to regimes where the op dominates, time both paths and
print a markdown table (pasted into docs/PERFORMANCE.md).

Methodology (tunneled TPU, ~26 ms RTT): per config, jit both paths with the
switch bound as a static argument, warm each once, then chain REPEATS async
dispatches and force completion with a single scalar fetch; per-op time =
window / REPEATS.  Same chaining as infer.stage_timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mmego_tpu.ops import pallas_kernels as pk

REPEATS = 30


def _timeit(fn, *args) -> float:
    out = fn(*args)
    np.asarray(jax.tree.map(jnp.sum, out))          # warm compile + fetch path
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        out = fn(*args)
    np.asarray(jnp.sum(out))                        # one fetch forces the chain
    return (time.perf_counter() - t0) / REPEATS


def sweep_gcn():
    print("\n### gcn_contract `einsum('nkctv,kvw->nctw')`\n")
    print("| n | k | c | t | v | XLA µs | Pallas µs | Pallas/XLA |")
    print("|---|---|---|---|---|---|---|---|")
    xla = jax.jit(lambda x, a: pk.gcn_contract(x, a, use_pallas=False))
    ker = jax.jit(lambda x, a: pk.gcn_contract(x, a, use_pallas=True))
    rows = []
    for n, k, c, t, v in [
        (20, 2, 32, 20, 15),     # the model's own ST-GCN block shape
        (400, 2, 64, 20, 15),    # B*L-flattened batch, mid block
        (400, 2, 128, 20, 15),   # deepest block
        (400, 3, 64, 20, 25),    # 'spatial' strategy K=3, bigger graph
        (64, 2, 64, 64, 128),    # graph at the 128-lane tile
        (256, 2, 128, 32, 128),  # contraction-dominated regime
    ]:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, k, c, t, v), jnp.float32)
        a = jax.random.normal(key, (k, v, v), jnp.float32)
        tx, tk = _timeit(xla, x, a), _timeit(ker, x, a)
        rows.append(((n, k, c, t, v), tx, tk))
        print(f"| {n} | {k} | {c} | {t} | {v} | {tx*1e6:.0f} | {tk*1e6:.0f} "
              f"| {tk/tx:.2f} |", flush=True)
    return rows


def sweep_attn():
    print("\n### attn_pool (masked softmax pooling over points)\n")
    print("| batch | n_pts | c | XLA µs | Pallas µs | Pallas/XLA |")
    print("|---|---|---|---|---|---|")
    xla = jax.jit(lambda x, w, b: pk.attn_pool(x, w, b, use_pallas=False))
    ker = jax.jit(lambda x, w, b: pk.attn_pool(x, w, b, use_pallas=True))
    rows = []
    for nb, n, c in [
        (400, 128, 28),      # upper PointNet pooling shape (B*L, 128, 28)
        (16700, 128, 64),    # full demo batch, global module width
        (16700, 20, 1024),   # IMU attention regime (pool over 20 samples)
        (4096, 1024, 64),    # many-point clouds
        (1024, 1024, 256),   # pooling-dominated
        (256, 4096, 128),    # HBM-bound long-point regime
    ]:
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (nb, n, c), jnp.float32)
        w = jax.random.normal(key, (c, 1), jnp.float32)
        b = jnp.zeros((1,), jnp.float32)
        tx, tk = _timeit(xla, x, w, b), _timeit(ker, x, w, b)
        rows.append(((nb, n, c), tx, tk))
        print(f"| {nb} | {n} | {c} | {tx*1e6:.0f} | {tk*1e6:.0f} "
              f"| {tk/tx:.2f} |", flush=True)
    return rows


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", \
        f"sweep needs the TPU backend, got {jax.default_backend()}"
    print(f"device: {jax.devices()[0]}, repeats={REPEATS}")
    sweep_gcn()
    sweep_attn()
