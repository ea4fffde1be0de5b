"""Shared tiny-fixture builders for the test suite."""

import numpy as np

from mmego_tpu.data.dataset import WindowData


def tiny_windows(rng, n, l=4, pts=16, with_r_rtw=False):
    """Random ``WindowData`` at toy shapes.

    Joint count (21), IMU packet (20x15), and bone table (20) stay
    real-sized -- the models hardcode them; frames and cloud points shrink.
    One shared builder so a future ``WindowData`` field changes ONE place,
    not five test files.
    """
    d = dict(
        cloud=rng.randn(n, l, pts, 6).astype(np.float32),
        key=rng.randn(n, l, 21, 3).astype(np.float32),
        imu=rng.randn(n, l, 20, 15).astype(np.float32),
        bones=np.tile(rng.randn(1, 20, 3).astype(np.float32) * 0.2, (n, 1, 1)),
        ground=rng.randn(n, l, 4).astype(np.float32),
        foot_contact=rng.randn(n, l, 2, 2).astype(np.float32),
        r_r0r=np.tile(np.eye(3, dtype=np.float32), (n, l, 1, 1)),
        t_r0r=rng.randn(n, l, 3).astype(np.float32),
        action=np.zeros(n, np.int32),
    )
    if with_r_rtw:
        d["r_rtw"] = np.tile(np.eye(3, dtype=np.float32), (n, l, 1, 1))
    return WindowData(**d)
