"""Serving: resident-weight batch prediction + real-time streaming windows.

The reference has no serving layer at all -- its only inference surface is
the offline per-window eval loop (``Processor/Test/Demo_test.py:71-184``,
SURVEY.md §3.1).  This module is the deployment-facing counterpart the
production use case (head-mounted radar + IMU, live pose) actually needs,
built the TPU way:

* ``Predictor`` -- loads the three-stage cascade once, jits ONE
  fixed-batch program (static shapes, single compile), keeps params
  HBM-resident, and serves arbitrary window counts by repeat-last-row
  padding + trimming (the same primitive as the benchmark path,
  ``parallel/mesh.pad_leading``).
* ``StreamingSession`` -- the online wrapper: a ring buffer of the last
  ``frame_no`` (cloud, imu) frames; every ``push`` emits the 21-joint
  skeleton for the CURRENT sliding window through a batch-1 program.
  (The reference's loader chops snippets into non-overlapping windows for
  offline eval, ``Dataset_sample.py:235-262``; a live head-mounted system
  wants a pose per frame, hence sliding -- the per-window math is
  identical.)
* ``CalibrationSession`` -- the raw-capture front end: consumes RAW frame
  dicts (the ``.mat`` variable schema, SURVEY.md §2.8), performs the
  loader's first-frame calibration + per-frame decode ONLINE
  (``data/ingest.FrameProcessor`` == reference ``Dataset_sample.py:146-233``
  -- literally the same code ingest runs, so the two paths are
  bit-identical), and drives a ``StreamingSession``.  A live head-mounted
  device reaches the serving layer from raw sensor frames with no offline
  ingest step.
* ``EnsemblePredictor`` -- prediction-level ensemble over independently
  trained stacks (member-mean joints; measured held-out gains in
  docs/PARITY.md), drop-in wherever a ``Predictor`` is accepted.

Latency (measured on the tunneled dev TPU, 400 pushes): **29 ms median /
32 ms p90** per ``push`` -- one dispatch + ONE packed fetch round trip
(the outputs are concatenated on device and split on host; separate
upper/lower/all fetches measured 78 ms).  On a locally attached chip the
RTT term vanishes and per-window device time is sub-millisecond (835
windows take ~57 ms), so frame-rate streaming is device-cheap.
"""

from __future__ import annotations

from collections import deque
from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mmego_tpu.config import Config, demo_config
from mmego_tpu import infer
from mmego_tpu.models import cascade as cascade_mod
from mmego_tpu.parallel import mesh as mesh_mod


@partial(jax.jit, static_argnums=(5, 6, 7))
def _packed_cascade_jit(params, state, cloud, imu, bones, lower_pc_no,
                        imu_used, kernels):
    """Cascade with the three joint outputs PACKED into one (B, L, 132)
    array: every host fetch over a tunneled backend costs a full round
    trip (~26 ms measured), so fetching upper/lower/all separately tripled
    the streaming push latency (measured 78 -> 29 ms median with the pack
    -- the floor is the one irreducible RTT; device time is sub-ms).
    Params ride as arguments, not closures, and ``kernels`` (a
    pallas_ctl.snapshot) is STATIC so the Pallas switch keys the cache --
    same rules as infer._cascade_jit."""
    from mmego_tpu.ops import pallas_ctl
    with pallas_ctl.snapshot_scope(kernels):
        out = cascade_mod.cascade_apply(params, state, cloud, imu, bones,
                                        lower_pc_no, imu_used)
    b, l = out["all"].shape[:2]
    return jnp.concatenate([out["upper"].reshape(b, l, 45),
                            out["lower"].reshape(b, l, 24),
                            out["all"].reshape(b, l, 63)], axis=-1)


def _unpack(flat: np.ndarray) -> Dict[str, np.ndarray]:
    b, l = flat.shape[:2]
    return {"upper": flat[..., :45].reshape(b, l, 15, 3),
            "lower": flat[..., 45:69].reshape(b, l, 8, 3),
            "all": flat[..., 69:].reshape(b, l, 21, 3)}


class Predictor:
    """Resident-weight batch predictor over 20-frame windows.

    Args:
      cfg: config (defaults to the demo profile; checkpoint paths resolve
        exactly as ``--infer`` does, ``infer.load_cascade_params``).
      params/state: pre-loaded cascade pytrees (skip checkpoint IO).
      batch: fixed device batch the compiled program serves (default
        ``cfg.infer_batch``); smaller inputs are padded, larger ones loop.
      warmup: run one padded batch at construction so the first real
        request never pays the compile.
    """

    def __init__(self, cfg: Optional[Config] = None, params=None, state=None,
                 batch: Optional[int] = None, warmup: bool = True):
        self.cfg = cfg or demo_config()
        if params is None:
            params, state = infer.load_cascade_params(self.cfg)
        from mmego_tpu.ops import pallas_ctl
        params, state = jax.device_put((params, state))
        self._fn = lambda c, i, b: _packed_cascade_jit(
            params, state, c, i, b, self.cfg.lower_pc_no, self.cfg.imu_used,
            pallas_ctl.snapshot())
        self.batch = int(batch or self.cfg.infer_batch)
        if warmup:
            c = np.zeros((self.batch, self.cfg.frame_no, self.cfg.pc_no, 6),
                         np.float32)
            i = np.zeros((self.batch, self.cfg.frame_no, 20, 15), np.float32)
            b = np.zeros((self.batch, 20, 3), np.float32)
            np.asarray(self._fn(jnp.asarray(c), jnp.asarray(i),
                                jnp.asarray(b)))

    def predict(self, cloud: np.ndarray, imu: np.ndarray,
                bones: np.ndarray) -> Dict[str, np.ndarray]:
        """Joints for ``W`` windows.

        Args:
          cloud: (W, L, P, 6) radar windows (P = ``cfg.pc_no`` padded size).
          imu:   (W, L, 20, 15) IMU windows.
          bones: (W, 20, 3) calibration bone vectors.
        Returns:
          {"upper": (W, L, 15, 3), "lower": (W, L, 8, 3),
           "all": (W, L, 21, 3)} in the reference frame, metres.
        """
        n = len(cloud)
        if n == 0:   # empty request: empty outputs, not a concat crash
            l = self.cfg.frame_no
            return {"upper": np.zeros((0, l, 15, 3), np.float32),
                    "lower": np.zeros((0, l, 8, 3), np.float32),
                    "all": np.zeros((0, l, 21, 3), np.float32)}
        flats = []
        for start in range(0, n, self.batch):
            sl = slice(start, start + self.batch)
            m = len(cloud[sl])
            out = self._fn(
                jnp.asarray(mesh_mod.pad_leading(cloud[sl], self.batch)),
                jnp.asarray(mesh_mod.pad_leading(imu[sl], self.batch)),
                jnp.asarray(mesh_mod.pad_leading(bones[sl], self.batch)))
            flats.append(np.asarray(out[:m]))      # ONE fetch per batch
        return _unpack(np.concatenate(flats, axis=0))


class EnsemblePredictor:
    """Prediction-level ensemble over independently trained stacks.

    Averages the joint predictions of N ``Predictor``s (each holding its
    own cascade weights).  Measured on the 167 held-out windows (round 5,
    docs/PARITY.md): the 8-stack augmented ensemble scores 4.431 cm vs 5.060 for the
    round-4 best single stack -- variance reduction across same-split
    stacks (plus augmentation-diversified members) is what moved the
    held-out plateau.  API-compatible
    with ``Predictor.predict``, so ``StreamingSession``/
    ``CalibrationSession`` accept it in place of a single predictor.
    """

    def __init__(self, predictors):
        if not predictors:
            raise ValueError("EnsemblePredictor needs at least one member")
        self.predictors = list(predictors)
        self.cfg = self.predictors[0].cfg
        self.batch = self.predictors[0].batch

    def predict(self, cloud: np.ndarray, imu: np.ndarray,
                bones: np.ndarray) -> Dict[str, np.ndarray]:
        outs = [p.predict(cloud, imu, bones) for p in self.predictors]
        return {k: np.mean([o[k] for o in outs], axis=0) for k in outs[0]}


class StreamingSession:
    """Sliding-window online inference for one capture session.

    Args:
      predictor: a ``Predictor`` (ideally constructed with ``batch=1``
        for latency; any batch works, the window is padded).
      bones: (20, 3) calibration bone vectors for this subject/session
        (the loader computes them from the first calibration frame,
        reference ``Dataset_sample.py:163-178``).
    """

    def __init__(self, predictor: Predictor, bones: np.ndarray):
        self.predictor = predictor
        self.bones = np.asarray(bones, np.float32)
        self._frames = deque(maxlen=predictor.cfg.frame_no)

    def __len__(self) -> int:
        return len(self._frames)

    @property
    def warm(self) -> bool:
        """True once a full window of frames has been pushed."""
        return len(self._frames) == self._frames.maxlen

    def push(self, cloud_frame: np.ndarray,
             imu_frame: np.ndarray) -> Optional[Dict[str, np.ndarray]]:
        """Add one frame; return the pose for the current window.

        Args:
          cloud_frame: (P, 6) padded radar frame.
          imu_frame: (20, 15) IMU packet.
        Returns:
          ``None`` until ``frame_no`` frames have been pushed, then
          {"upper"/"lower"/"all": (L, J, 3)} for the sliding window ending
          at this frame.
        """
        self._frames.append((np.asarray(cloud_frame, np.float32),
                             np.asarray(imu_frame, np.float32)))
        if not self.warm:
            return None
        cloud = np.stack([c for c, _ in self._frames])[None]   # (1, L, P, 6)
        imu = np.stack([i for _, i in self._frames])[None]     # (1, L, 20, 15)
        out = self.predictor.predict(cloud, imu, self.bones[None])
        return {k: v[0] for k, v in out.items()}


class CalibrationSession:
    """Raw-capture front end: online calibration + per-frame decode +
    sliding-window inference.

    The first pushed frame calibrates the session exactly as the offline
    loader's first frame does (reference ``Dataset_sample.py:163-178``):
    camera reference ``R_btc``, IMU orientation reference
    ``orientation_imu_img``, and -- when Kinect GT joints ride along
    (``pc_xyz_key_2``) -- the per-bone table.  A GT-free deployment passes
    ``bones`` explicitly (a one-time measured (20, 3) bone-vector table)
    and its frames may omit every Kinect-derived field.

    Args:
      predictor: a ``Predictor`` (batch=1 for latency), or ``None`` to run
        calibration/decode only (``push_raw`` then returns processed frames
        without poses -- e.g. for recording).
      bones: optional (20, 3) bone vectors; default: calibrated from the
        first frame's GT joints.
      padding_seed: seed for the pad/subsample RNG stream (the offline
        loader's seeded-departure policy, docs/PARITY.md).
    """

    def __init__(self, predictor: Optional[Predictor] = None,
                 bones: Optional[np.ndarray] = None, padding_seed: int = 0,
                 pc_no: Optional[int] = None):
        from mmego_tpu.config import (KINECT_JOINT_SELECTION, SKELETON_ALL,
                                      DEFAULT)
        from mmego_tpu.data import ingest
        cfg = predictor.cfg if predictor is not None else DEFAULT
        self.predictor = predictor
        self._bones = None if bones is None else np.asarray(bones, np.float32)
        # strict=False: live frames may omit Kinect-derived fields (t_R0R,
        # foot_contact, ...); only first-frame bone calibration still
        # requires GT joints (unless ``bones`` was given).
        self.proc = ingest.FrameProcessor(
            pc_no or cfg.pc_no, np.random.RandomState(padding_seed),
            KINECT_JOINT_SELECTION, SKELETON_ALL,
            compute_bones=bones is None, strict=False)
        self._session: Optional[StreamingSession] = None

    @property
    def bones(self) -> Optional[np.ndarray]:
        """The active bone table (given, or calibrated from frame one)."""
        if self._bones is not None:
            return self._bones
        return self.proc.body_length

    def push_raw(self, frame: Dict) -> Optional[Dict]:
        """Push one RAW capture frame (``.mat`` variable schema: at least
        ``pc_xyziv_ti2``, ``imu_save_l``, ``orientation_imu_img``,
        ``R_btc``; plus ``pc_xyz_key_2`` on the first frame unless
        ``bones`` was given).

        Returns ``None`` for an empty point cloud (the loader skips such
        frames), else a dict with the processed ``cloud`` (pc_no, 6) and
        ``imu`` (20, 15) float32 frames -- bit-identical to what offline
        ingest would pack -- and, once a predictor-backed window is warm,
        ``pose`` ({"upper"/"lower"/"all"} joint arrays).
        """
        processed = self.proc.process(frame)
        if processed is None:
            return None
        # Single f64->f32 rounding, matching ingest's deferred final cast.
        out = {"cloud": processed["cloud"].astype(np.float32),
               "imu": processed["imu"].astype(np.float32)}
        if self.predictor is not None:
            if self._session is None:
                self._session = StreamingSession(self.predictor, self.bones)
            pose = self._session.push(out["cloud"], out["imu"])
            if pose is not None:
                out["pose"] = pose
        return out
