"""Microbenchmark: IMU fast-stack LSTM kernel variants at the demo shapes.

The cascade profile (2026-08-17) shows the four fast-stack layer-direction
kernels are ~63% of device time and run at ~48% of bf16 MXU peak: each grid
step serialises [x-dots -> h-dot -> VPU gate chain], and the ~12 us of
transcendentals (3 sigmoids + 2 tanh on a (512, 2048) f32 tile) idles the
MXU.  This harness times the shipped fused stack and experimental variants
standalone so kernel edits are measured before they touch the model.

Run on the TPU:  python scripts/lstm_kernel_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mmego_tpu.nn import lstm as lstm_mod
from mmego_tpu.ops import pallas_lstm

B, T, F, H, LAYERS = 16700, 20, 512, 512, 2


def _sync(o):
    for leaf in jax.tree.leaves(o):
        np.asarray(leaf)   # fetching forces completion on tunneled backends


def time_fn(fn, *args, repeats=10):
    out = fn(*args)
    _sync(jax.tree.map(jnp.sum, out))
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    _sync(jax.tree.map(jnp.sum, out))
    return (time.perf_counter() - t0) / repeats


def main():
    rng = jax.random.PRNGKey(0)
    params = lstm_mod.lstm_init(rng, F, H, LAYERS, True)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, F), jnp.float32)

    flops = 0
    f_in = F
    for _ in range(LAYERS):
        flops += 2 * 2 * B * T * (f_in + H) * 4 * H   # 2 dirs: x-dots + h-dot
        f_in = 2 * H

    def report(name, dt):
        print(f"{name}: {dt*1e3:7.2f} ms   {flops/dt/1e12:6.1f} TFLOP/s "
              f"({flops/dt/1e12/197*100:4.1f}% of v5e bf16 peak)", flush=True)

    os.environ["MMEGO_LSTM_PIPE"] = "0"   # read at trace time
    stack = jax.jit(lambda p, x: pallas_lstm.fused_stack(p, x))
    report("v2 fused_stack", time_fn(stack, params, x))
    # v2 at the v3-optimal block: isolates the pipelining gain from the
    # block-size change
    v2_448 = jax.jit(lambda p, x: pallas_lstm._run_stack(
        p, pallas_lstm._pad_rows(
            jnp.swapaxes(x, 0, 1).astype(jnp.bfloat16), 448), 448,
        pipe=False))
    report("v2 bb=448    ", time_fn(v2_448, params, x))
    os.environ.pop("MMEGO_LSTM_PIPE")

    # v4 dual-direction kernel: measured 45.12 ms here on 2026-08-20 (vs v3
    # 45.06, v2@448 44.82 -- no win) and deleted; see the note at the end of
    # ops/pallas_lstm.py.

    for bb in (320, 384, 448):
        pipe = jax.jit(lambda p, x, bb=bb:
                       pallas_lstm._fused_stack_tm_pipe_impl(p, x, block_b=bb))
        try:
            report(f"v3 pipe bb={bb}", time_fn(pipe, params, x))
        except Exception as e:
            print(f"v3 pipe bb={bb} FAILED: {str(e)[:120]}", flush=True)

    # slow-stack shapes: B=835, F=1024 (pooled 2H), 2 layers
    sparams = lstm_mod.lstm_init(jax.random.PRNGKey(2), 1024, H, LAYERS, True)
    sx = jax.random.normal(jax.random.PRNGKey(3), (835, T, 1024), jnp.float32)
    # small=0 routes through _plan's large-batch default (two 448-row v3
    # blocks at B=835); small=896 takes the shipped one-block v2 path
    for label, small in (("slow 2x448 v3", 0), ("slow 1-block v2", 896)):
        pallas_lstm.SMALL_BATCH_ONE_BLOCK = small
        fn = jax.jit(lambda p, x: pallas_lstm.fused_stack(p, x))
        t0 = time_fn(fn, sparams, sx)
        print(f"{label}: {t0*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
