"""Serving layer: resident-weight Predictor + sliding StreamingSession."""

import numpy as np
import jax
import pytest

from mmego_tpu.config import Config
from mmego_tpu.models import cascade
from mmego_tpu import infer, serve

from _helpers import tiny_windows


@pytest.fixture(scope="module")
def world():
    rng = np.random.RandomState(0)
    data = tiny_windows(rng, 5)
    params, state = cascade.cascade_init(jax.random.PRNGKey(0))
    cfg = Config(frame_no=4, pc_no=16, lower_pc_no=8, infer_batch=2)
    return cfg, data, params, state


def test_predictor_matches_eval_path(world):
    """Predictor output must equal the benchmark path's cascade on the
    same windows (same program family, padding trimmed)."""
    cfg, data, params, state = world
    pred = serve.Predictor(cfg, params=params, state=state, batch=2)
    out = pred.predict(data.cloud, data.imu, data.bones)
    ref = infer.run_cascade_batched(params, state, data, batch=2,
                                    lower_pc_no=cfg.lower_pc_no)
    assert out["all"].shape == (5, 4, 21, 3)
    for k in ("upper", "lower", "all"):
        np.testing.assert_allclose(out[k], ref[k], rtol=1e-5, atol=1e-6)


def test_predictor_serves_any_window_count(world):
    """Counts below/above the compiled batch pad/loop transparently."""
    cfg, data, params, state = world
    pred = serve.Predictor(cfg, params=params, state=state, batch=4)
    one = pred.predict(data.cloud[:1], data.imu[:1], data.bones[:1])
    assert one["all"].shape == (1, 4, 21, 3)
    five = pred.predict(data.cloud, data.imu, data.bones)   # 5 > batch 4
    np.testing.assert_allclose(five["all"][:1], one["all"],
                               rtol=1e-5, atol=1e-6)


def test_predictor_empty_request(world):
    """Zero windows return empty, correctly-shaped outputs (not a
    np.concatenate crash)."""
    cfg, data, params, state = world
    pred = serve.Predictor(cfg, params=params, state=state, batch=2,
                           warmup=False)
    out = pred.predict(data.cloud[:0], data.imu[:0], data.bones[:0])
    assert out["all"].shape == (0, cfg.frame_no, 21, 3)
    assert out["upper"].shape == (0, cfg.frame_no, 15, 3)
    assert out["lower"].shape == (0, cfg.frame_no, 8, 3)


def test_streaming_session_sliding_window(world):
    """Per-frame pushes: None until warm, then the pose of the sliding
    window -- bit-matching the batch path on the same window."""
    cfg, data, params, state = world
    pred = serve.Predictor(cfg, params=params, state=state, batch=1)
    sess = serve.StreamingSession(pred, data.bones[0])

    w0 = 0
    results = []
    for t in range(cfg.frame_no):
        results.append(sess.push(data.cloud[w0, t], data.imu[w0, t]))
    assert results[:-1] == [None] * (cfg.frame_no - 1)  # not warm yet
    assert sess.warm
    ref = pred.predict(data.cloud[w0:w0 + 1], data.imu[w0:w0 + 1],
                       data.bones[w0:w0 + 1])
    np.testing.assert_allclose(results[-1]["all"], ref["all"][0],
                               rtol=1e-5, atol=1e-6)

    # one more frame: the window slides (frames 1..L of a synthetic
    # continuation) and output changes shape-compatibly
    nxt = sess.push(data.cloud[w0 + 1, 0], data.imu[w0 + 1, 0])
    assert nxt["all"].shape == (cfg.frame_no, 21, 3)
    assert len(sess) == cfg.frame_no  # ring stays at window length
