"""Streaming-push latency measurement (the docs/PERFORMANCE.md serving
numbers).  Builds a batch-1 Predictor + StreamingSession on the headline
stack, replays real demo-split frames as a live capture, and reports
median/p90 per-push wall time.

Usage: python scripts/serve_latency.py [n_pushes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmego_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np

from mmego_tpu import serve
from mmego_tpu.config import demo_config
from mmego_tpu.data import dataset as dataset_mod


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    cfg = demo_config()
    data = dataset_mod.load_split(cfg, "vis")
    pred = serve.Predictor(cfg, batch=1)
    sess = serve.StreamingSession(pred, data.bones[0])

    lat = []
    i = 0
    while len(lat) < n:
        w, t = divmod(i, cfg.frame_no)
        i += 1
        t0 = time.perf_counter()
        out = sess.push(data.cloud[w % len(data), t], data.imu[w % len(data), t])
        if out is not None:
            lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3
    print(f"pushes={len(lat)} median={np.median(lat_ms):.1f}ms "
          f"p90={np.percentile(lat_ms, 90):.1f}ms "
          f"p99={np.percentile(lat_ms, 99):.1f}ms", flush=True)


if __name__ == "__main__":
    main()
