import numpy as np
import jax

from mmego_tpu.models import cascade
from mmego_tpu.data.dataset import WindowData
from mmego_tpu.utils import selfcheck


def _tiny(rng, n=8, l=4, pts=16):
    return WindowData(
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


def test_selfcheck_passes_on_cpu():
    rng = np.random.RandomState(0)
    data = _tiny(rng)
    params, state = cascade.cascade_init(jax.random.PRNGKey(0))
    assert selfcheck.run(params, state, data, batch=8, lower_pc_no=8,
                         tol_cpu=1e-4, verbose=False)


def test_batch_invariance_reports_deviation():
    rng = np.random.RandomState(1)
    data = _tiny(rng)
    params, state = cascade.cascade_init(jax.random.PRNGKey(1))
    dev = selfcheck.batch_invariance(params, state, data, batch=8, probe=4,
                                     lower_pc_no=8)
    assert set(dev) == {"upper", "lower", "all", "max"}
    assert dev["max"] < 1e-4  # CPU backend: per-window math is batch-stable
