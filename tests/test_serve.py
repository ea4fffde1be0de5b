"""Serving layer: resident-weight Predictor + sliding StreamingSession +
raw-capture CalibrationSession."""

import glob
import os

import numpy as np
import jax
import pytest

from mmego_tpu.config import Config, DEFAULT
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


def test_ensemble_predictor(world):
    """Ensemble output == member-mean; streaming accepts it in place of a
    single Predictor (duck-typed predict/cfg)."""
    cfg, data, params, state = world
    p2, s2 = cascade.cascade_init(jax.random.PRNGKey(7))
    a = serve.Predictor(cfg, params=params, state=state, batch=2,
                        warmup=False)
    b = serve.Predictor(cfg, params=p2, state=s2, batch=2, warmup=False)
    ens = serve.EnsemblePredictor([a, b])
    out = ens.predict(data.cloud, data.imu, data.bones)
    oa = a.predict(data.cloud, data.imu, data.bones)
    ob = b.predict(data.cloud, data.imu, data.bones)
    for k in ("upper", "lower", "all"):
        np.testing.assert_allclose(out[k], (oa[k] + ob[k]) / 2.0,
                                   rtol=1e-6, atol=1e-7)
    with pytest.raises(ValueError):
        serve.EnsemblePredictor([])

    sess = serve.StreamingSession(ens, data.bones[0])
    for t in range(cfg.frame_no):
        res = sess.push(data.cloud[0, t], data.imu[0, t])
    assert res["all"].shape == (cfg.frame_no, 21, 3)


# ---------------------------------------------------------------------------
# CalibrationSession: raw frames -> calibration -> streaming
# ---------------------------------------------------------------------------

def _raw_frame(rng, n_pts=10, with_gt=True):
    """A synthetic raw capture frame in the .mat variable schema."""
    f = {"pc_xyziv_ti2": rng.randn(n_pts, 5).astype(np.float64),
         "imu_save_l": rng.randn(20, 15).astype(np.float64),
         "orientation_imu_img": np.eye(3),
         "R_btc": np.eye(3)}
    if with_gt:
        f["pc_xyz_key_2"] = rng.randn(32, 3).astype(np.float64)
        f["t_R0R"] = rng.randn(1, 3)
        f["abcd_ground_2"] = rng.randn(1, 4)
        f["foot_contact"] = np.array([[1, 0]], np.uint8)
    return f


def test_calibration_session_streams_poses(world):
    """Raw frames -> online calibration -> sliding-window poses; the pose
    must equal Predictor.predict on the window the session assembled."""
    cfg, data, params, state = world
    pred = serve.Predictor(cfg, params=params, state=state, batch=1)
    sess = serve.CalibrationSession(pred, padding_seed=0)
    rng = np.random.RandomState(7)

    outs = [sess.push_raw(_raw_frame(rng)) for _ in range(cfg.frame_no)]
    assert all(o is not None and "pose" not in o for o in outs[:-1])
    assert "pose" in outs[-1]
    assert sess.bones.shape == (20, 3)     # calibrated from frame-1 GT

    cloud = np.stack([o["cloud"] for o in outs])[None]
    imu = np.stack([o["imu"] for o in outs])[None]
    ref = pred.predict(cloud, imu, sess.bones[None])
    np.testing.assert_allclose(outs[-1]["pose"]["all"], ref["all"][0],
                               rtol=1e-5, atol=1e-6)


def test_calibration_session_gt_free(world):
    """A GT-free deployment: explicit bone table, frames carry only the
    live-sensor fields; empty clouds are skipped like the loader does."""
    cfg, data, params, state = world
    pred = serve.Predictor(cfg, params=params, state=state, batch=1,
                           warmup=False)
    rng = np.random.RandomState(8)
    sess = serve.CalibrationSession(pred, bones=data.bones[0])
    assert sess.push_raw(_raw_frame(rng, n_pts=0, with_gt=False)) is None
    for _ in range(cfg.frame_no):
        out = sess.push_raw(_raw_frame(rng, with_gt=False))
    assert "pose" in out and out["pose"]["all"].shape == (cfg.frame_no, 21, 3)

    # without bones, a GT-free first frame must fail loudly
    with pytest.raises(ValueError, match="pc_xyz_key_2"):
        serve.CalibrationSession(pred).push_raw(_raw_frame(rng, with_gt=False))


def test_calibration_gt_first_frame_then_live_stream(world):
    """The documented online path: frame 1 carries Kinect GT (calibrates
    the bone table), every later frame is live-sensor-only -- the stream
    must keep flowing (round-5 review regression test)."""
    cfg, data, params, state = world
    pred = serve.Predictor(cfg, params=params, state=state, batch=1,
                           warmup=False)
    rng = np.random.RandomState(11)
    sess = serve.CalibrationSession(pred)
    first = _raw_frame(rng)                      # GT frame: calibrates
    del first["t_R0R"], first["foot_contact"], first["abcd_ground_2"]
    assert sess.push_raw(first) is not None      # partial GT is fine online
    assert sess.bones.shape == (20, 3)
    for _ in range(cfg.frame_no):
        out = sess.push_raw(_raw_frame(rng, with_gt=False))
    assert "pose" in out


def test_frame_processor_strict_for_offline_ingest():
    """The GT-field laxity is gated on compute_bones=False: offline ingest
    (compute_bones=True) must still crash loudly on a truncated frame
    instead of packing zero GT into training windows (round-5 review)."""
    from mmego_tpu.config import KINECT_JOINT_SELECTION, SKELETON_ALL
    from mmego_tpu.data import ingest

    rng = np.random.RandomState(9)
    proc = ingest.FrameProcessor(16, np.random.RandomState(0),
                                 KINECT_JOINT_SELECTION, SKELETON_ALL)
    frame = _raw_frame(rng)
    proc.process(dict(frame))                   # calibrates fine
    broken = dict(frame)
    del broken["t_R0R"]
    with pytest.raises(KeyError):
        proc.process(broken)
    no_gt = dict(frame)
    del no_gt["pc_xyz_key_2"]
    with pytest.raises(ValueError, match="pc_xyz_key_2"):
        proc.process(no_gt)


@pytest.mark.skipif(not os.path.isdir(DEFAULT.data_root),
                    reason="sample data absent")
def test_calibration_session_matches_offline_ingest():
    """End-to-end raw-.mat -> calibration -> processed frames, bit-identical
    to the windows offline ingest packs (VERDICT r4 #6 'Done' bar).

    The first PROCESSED snippet of the walk (the very first is skipped,
    Dataset_sample.py:134-135) consumes the pad-RNG stream from its start,
    so a fresh CalibrationSession fed the same frames in the same order
    reproduces ingest's cloud/imu/bones windows exactly."""
    import scipy.io as scio

    from mmego_tpu.data import ingest as ingest_mod

    packed = ingest_mod.load_or_ingest(
        DEFAULT.data_root, DEFAULT.cache_dir, DEFAULT.frame_no,
        DEFAULT.pc_no, DEFAULT.padding_seed, verbose=False)

    act0 = sorted((d for d in os.listdir(DEFAULT.data_root) if d.isdigit()),
                  key=int)[0]
    snips = sorted(s for s in os.listdir(os.path.join(DEFAULT.data_root, act0))
                   if os.path.isdir(os.path.join(DEFAULT.data_root, act0, s)))
    mats = sorted(glob.glob(os.path.join(DEFAULT.data_root, act0, snips[1],
                                         "*.mat")),
                  key=ingest_mod._numeric_key)

    sess = serve.CalibrationSession(predictor=None,
                                    padding_seed=DEFAULT.padding_seed)
    frames = [f for f in (sess.push_raw(scio.loadmat(p)) for p in mats)
              if f is not None]

    # ingest windows this snippet tail-first; its windows lead the pack.
    n_win = len(frames) // DEFAULT.frame_no
    assert n_win >= 1
    np.testing.assert_array_equal(sess.bones, packed["bones"][0])
    for w in range(n_win):
        lo = len(frames) - (w + 1) * DEFAULT.frame_no
        win = frames[lo:lo + DEFAULT.frame_no]
        np.testing.assert_array_equal(
            np.stack([f["cloud"] for f in win]), packed["cloud"][w])
        np.testing.assert_array_equal(
            np.stack([f["imu"] for f in win]), packed["imu"][w])
