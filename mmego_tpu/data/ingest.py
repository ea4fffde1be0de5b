"""Dataset ingest: .mat frame tree -> packed, cacheable numpy arrays.

Reproduces ``Util/Universal_Util/Dataset_sample.py::PosePC.dataRead`` exactly
(directory-walk order, first-snippet skip, first-frame calibration, IMU
re-referencing and sign fix-ups, 6-feature point construction, pad/subsample
to 128 points, tail-first non-overlapping windowing) with two deliberate
departures, both documented in SURVEY.md §0/§2.3:

  * the pad/subsample RNG is **seeded** (the reference uses bare
    ``np.random.choice``, so its eval metrics reproduce only to within that
    sampling noise);
  * everything is materialised once into a single compressed ``.npz`` cache
    (~ tens of MB) instead of re-walking 19,208 ``scipy.io.loadmat`` calls per
    run; at runtime the arrays are pushed to HBM wholesale, so the hot loop
    never touches the host.

Per-window action ids are recorded so the demo-mode per-action capping
(``Dataset_action.py``, cumulative ``batch_per_action`` cap) can be applied as
a cheap post-hoc selection rather than a separate loader.
"""

from __future__ import annotations

import glob
import hashlib
import os
import re
from typing import Dict

import numpy as np
import scipy.io as scio

# Fixed basis-change matrices (Dataset_sample.py:18-20).
R_RI = np.array([[0, 0, 1], [0, -1, 0], [1, 0, 0]], dtype=np.float64)
R_TTB = np.array([[0, -1, 0], [-1, 0, 0], [0, 0, -1]], dtype=np.float64)
R_CTW = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], dtype=np.float64)

_NUM_RE = re.compile(r"\d+")

ARRAY_KEYS = ("cloud", "key", "imu", "bones", "ground", "foot_contact",
              "r_r0r", "t_r0r", "r_rtw", "action", "snippet", "win_pos")

# Per-window (not per-frame) keys; everything else stacks frame_no frames.
_WINDOW_KEYS = ("bones", "action", "snippet", "win_pos")

# The .mat variables the pipeline consumes (SURVEY.md §2.8).
MAT_KEYS = frozenset({
    "pc_xyziv_ti2", "pc_xyz_key_2", "imu_save_l", "orientation_imu_img",
    "R_btc", "t_R0R", "abcd_ground_2", "foot_contact"})


def _make_loader():
    """Prefer the native C++ MAT reader (data/native.py) restricted to the
    needed keys; fall back to scipy.  MMEGO_NATIVE_MAT=0 forces scipy."""
    if os.environ.get("MMEGO_NATIVE_MAT", "1") != "0":
        from mmego_tpu.data import native
        if native.available():
            def _load(p):
                try:
                    return native.loadmat(p, MAT_KEYS)
                except IOError:
                    # Per-FILE fallback: one file the lean C++ parser rejects
                    # (exotic MAT feature, corruption) must not abort a
                    # 19,208-file walk -- scipy gets a second opinion.
                    return scio.loadmat(p)
            return _load
    return scio.loadmat


def _numeric_key(path: str):
    return [int(x) for x in _NUM_RE.findall(os.path.basename(path))]


def _iter_loaded(loadmat, paths, workers: int = 0, depth: int = 128):
    """Ordered prefetching loader over a thread pool.

    The 19,208 per-frame ``.mat`` parses dominate cold-cache ingest and are
    embarrassingly parallel (the native C reader releases the GIL for the
    whole parse; scipy's zlib path mostly does too).  Everything *stateful* --
    per-subject calibration, the seeded pad/subsample RNG stream -- stays on
    the consuming thread, which receives results strictly in walk order, so
    the packed output is bit-identical to the serial walk.

    ``workers`` <= 1 degrades to a plain serial loop.  ``depth`` bounds how
    many parsed frames may be in flight (memory backstop).
    """
    if workers <= 1:
        for p in paths:
            yield loadmat(p)
        return
    import collections
    import concurrent.futures as cf

    with cf.ThreadPoolExecutor(max_workers=workers) as ex:
        pending = collections.deque()
        it = iter(paths)
        for p in it:
            pending.append(ex.submit(loadmat, p))
            if len(pending) >= depth:
                break
        while pending:
            result = pending.popleft().result()
            for p in it:
                pending.append(ex.submit(loadmat, p))
                break
            yield result


def _ingest_workers() -> int:
    """Thread count for the .mat prefetcher (MMEGO_INGEST_WORKERS overrides;
    0/1 forces the serial walk)."""
    env = os.environ.get("MMEGO_INGEST_WORKERS")
    if env is not None:
        return int(env)
    return min(16, os.cpu_count() or 1)


def ingest(data_root: str, frame_no: int = 20, pc_no: int = 128,
           padding_seed: int = 0,
           joint_selection=None, skeleton=None,
           layout: str = "sample") -> Dict[str, np.ndarray]:
    """Walk the .mat tree and build the packed window arrays.

    layout='sample': ``{root}/{action}/{snippet}/*.mat`` -- the released
    sample data (``Dataset_sample.py``).  layout='full': an extra subject
    level ``{root}/{subject}/{action}/{snippet}/*.mat`` with per-subject
    recalibration (``Dataset.py:118-123``; st/bone lengths reset per subject,
    bone *directions* stay frozen from the first subject via
    ``initial_body_unit``, Dataset.py:174-181) and a ``subject`` label array.

    Returns a dict of arrays, all with leading window axis W (835 for the
    released sample data at frame_no=20):
      cloud (W, L, 128, 6)  key (W, L, 21, 3)  imu (W, L, 20, 15)
      bones (W, 20, 3)      ground (W, L, 4)   foot_contact (W, L, 2, 2)
      r_r0r (W, L, 3, 3)    t_r0r (W, L, 3)    r_rtw (W, L, 3, 3)
      action (W,) int32     snippet (W,) int32 (globally unique snippet id)
      win_pos (W,) int32 (windows cut from the snippet so far; 0 = tail)
      [subject (W,) int32 when layout='full']
    """
    from mmego_tpu.config import KINECT_JOINT_SELECTION, SKELETON_ALL
    joint_selection = list(joint_selection or KINECT_JOINT_SELECTION)
    skeleton = list(skeleton or SKELETON_ALL)

    rng = np.random.RandomState(padding_seed)
    loadmat = _make_loader()
    out = {k: [] for k in ARRAY_KEYS}
    out["subject"] = []

    if layout == "full":
        subjects = [(s, os.path.join(data_root, s))
                    for s in sorted(os.listdir(data_root))
                    if os.path.isdir(os.path.join(data_root, s))]
    elif layout == "sample":
        subjects = [(None, data_root)]
    else:
        raise ValueError(f"unknown layout {layout!r}")

    initial_body_unit = None  # bone directions: frozen from first calibration
    snip_base = 0             # snippet ids globally unique across subjects
    for subj_idx, (subj_name, subj_root) in enumerate(subjects):
        sub_out, initial_body_unit = _ingest_subject(
            subj_root, frame_no, pc_no, rng, loadmat, joint_selection,
            skeleton, initial_body_unit)
        for k in ARRAY_KEYS:
            if k == "snippet":
                out[k].extend(s + snip_base for s in sub_out[k])
            else:
                out[k].extend(sub_out[k])
        if sub_out["snippet"]:
            snip_base = max(out["snippet"]) + 1
        out["subject"].extend([subj_idx] * len(sub_out["action"]))

    packed = {k: np.stack(out[k]).astype(np.float32) for k in ARRAY_KEYS
              if k not in ("action", "snippet", "win_pos")}
    for k in ("action", "snippet", "win_pos"):
        packed[k] = np.asarray(out[k], dtype=np.int32)
    if layout == "full":
        packed["subject"] = np.asarray(out["subject"], dtype=np.int32)
    return packed


class FrameProcessor:
    """Stateful per-frame decode: the ONE implementation of the reference's
    frame pipeline (``Dataset_sample.py:146-233``), shared by offline ingest
    and the online serving calibration (``serve.CalibrationSession``) so the
    two paths are bit-identical by construction.

    State: first-frame calibration (camera reference ``r_ref``, IMU
    orientation reference, bone table with directions frozen from the very
    first calibration ever -- ``initial_body_unit``) plus the seeded
    pad/subsample RNG stream.
    """

    def __init__(self, pc_no: int, rng: np.random.RandomState,
                 joint_selection, skeleton, initial_body_unit=None,
                 compute_bones: bool = True, strict: bool = True):
        self.pc_no = pc_no
        self.rng = rng
        self.joint_selection = list(joint_selection)
        self.skeleton = list(skeleton)
        self.initial_body_unit = initial_body_unit
        # compute_bones=False: the caller supplies a measured bone table
        # (GT-free deployment).  strict=True (offline ingest): EVERY
        # Kinect-derived field is required and a truncated .mat crashes the
        # walk loudly.  strict=False (online serving): fields beyond the
        # live-sensor set may be absent and zero-fill -- except the
        # first-frame GT joints when bone calibration needs them, which
        # stays a loud ValueError.
        self.compute_bones = compute_bones
        self.strict = strict
        self.calibrated = False
        self.r_ref = None
        self.orientation_ref = None
        self.body_length = None

    def process(self, data: Dict) -> Dict:
        """Decode one raw frame (the ``.mat`` variable dict, §2.8 schema).

        Returns the per-frame arrays (``cloud`` (pc_no, 6) f32, ``key``
        (21, 3), ``imu`` (20, 15) f64 fixed up, ``ground`` (4,),
        ``foot_contact`` (2, 2), ``r_r0r``/``r_rtw`` (3, 3), ``t_r0r``
        (3,)) or ``None`` for an empty point cloud (the reference skips
        such frames, Dataset_sample.py:151-152)."""
        pc = np.asarray(data["pc_xyziv_ti2"][:, 0:5], dtype=np.float64)
        if len(pc) == 0:
            return None
        # Field strictness: see __init__.  Online sessions (strict=False)
        # tolerate missing Kinect-derived fields; offline ingest keeps the
        # loud KeyError so a truncated .mat crashes the walk instead of
        # packing zero GT into training windows.
        lax = not self.strict

        def get(name, shape):
            if not lax or name in data:
                return data[name]
            return np.zeros(shape)

        if ("pc_xyz_key_2" not in data and
                (not lax or (self.compute_bones and not self.calibrated))):
            raise ValueError(
                "frame lacks pc_xyz_key_2 (Kinect GT joints). Offline "
                "ingest requires it on every frame; online bone calibration "
                "needs it on the FIRST frame (or construct the processor "
                "with compute_bones=False and supply a bone table)")
        if "pc_xyz_key_2" in data:
            key = np.asarray(data["pc_xyz_key_2"][:, 0:3])[self.joint_selection]
        else:
            key = np.zeros((len(self.joint_selection), 3))
        imu = np.asarray(data["imu_save_l"], dtype=np.float64).copy()
        orientation = np.asarray(data["orientation_imu_img"])
        t_r0r = np.asarray(get("t_R0R", (1, 3))).reshape(3)
        r_btc = np.asarray(data["R_btc"])

        if not self.calibrated:
            # First frame of the subject: freeze camera/IMU references
            # and the bone table (Dataset_sample.py:163-178).  Bone
            # *directions* come from the very first calibration ever;
            # later subjects only rescale magnitudes (Dataset.py:174-181).
            self.r_ref = r_btc
            self.orientation_ref = orientation
            if self.compute_bones:
                body = np.stack([key[p] - key[c] for p, c in self.skeleton])
                if self.initial_body_unit is None:
                    self.initial_body_unit = body / np.linalg.norm(
                        body, axis=-1, keepdims=True)
                    self.body_length = body.astype(np.float32)
                else:
                    norm = np.linalg.norm(body, axis=-1, keepdims=True)
                    self.body_length = (norm * self.initial_body_unit
                                        ).astype(np.float32)
            self.calibrated = True

        r_r0r = R_TTB @ self.r_ref @ r_btc.T @ R_TTB.T
        r_rtw = R_TTB @ r_btc @ R_CTW

        # IMU orientation re-referencing: rows 0:3/3:6/6:9 are the rows of
        # a 3x3 orientation stacked column-wise (Dataset_sample.py:184-189).
        # reshape+swapaxes, not np.stack: a per-frame 3-way stack costs
        # ~0.5 ms of pure Python overhead x 19,114 frames (~10 s of a 27 s
        # cold ingest).
        r_ni = imu[:, :9].reshape(-1, 3, 3).swapaxes(1, 2)
        r_i0i = self.orientation_ref.T @ r_ni
        imu_rr0 = R_RI @ r_i0i @ R_RI.T
        imu[:, 0:3] = imu_rr0[:, 0, :]
        imu[:, 3:6] = imu_rr0[:, 1, :]
        imu[:, 6:9] = imu_rr0[:, 2, :]
        # gravity compensation then sign flips, in this order
        # (Dataset_sample.py:190-193)
        imu[:, 11] += 9.8
        imu[:, 10:12] *= -1.0
        imu[:, 13:] *= -1.0

        fc_raw = np.asarray(get("foot_contact", (1, 2))).reshape(-1)
        foot = np.asarray(
            [[0, 1] if fc_raw[0] else [1, 0],
             [0, 1] if fc_raw[1] else [1, 0]], dtype=np.float32)

        ground = np.asarray(get("abcd_ground_2", (1, 4)),
                            dtype=np.float64).reshape(4)
        if ground[0] > 0:
            ground = -ground

        # 6-feature points: x, y, z, range, velocity, intensity
        # (Dataset_sample.py:203-208; cols 4:2:-1 = (v, i)).
        feat = np.zeros((len(pc), 6), dtype=np.float32)
        xyz = pc[:, 0:3]
        feat[:, 0:3] = xyz
        feat[:, 3] = np.sqrt(np.einsum("ij,ij->i", xyz, xyz))
        feat[:, 4] = pc[:, 4]
        feat[:, 5] = pc[:, 3]

        # Pad (scatter into random slots, zero elsewhere) or random
        # subset (Dataset_sample.py:210-224), seeded RNG stream.
        frame_cloud = np.zeros((self.pc_no, 6), dtype=np.float32)
        if len(feat) < self.pc_no:
            slots = self.rng.choice(self.pc_no, size=len(feat), replace=False)
            frame_cloud[slots] = feat
        else:
            keep = self.rng.choice(len(feat), size=self.pc_no, replace=False)
            frame_cloud = feat[keep]

        return {"cloud": frame_cloud, "key": key, "imu": imu,
                "ground": ground, "foot_contact": foot, "r_r0r": r_r0r,
                "t_r0r": t_r0r, "r_rtw": r_rtw}


def _ingest_subject(data_root, frame_no, pc_no, rng, loadmat,
                    joint_selection, skeleton, initial_body_unit):
    """One subject's walk: calibration state resets here (Dataset.py:120-122)."""
    out = {k: [] for k in ARRAY_KEYS}

    # Numeric-named subdirectories only: a stray file (.DS_Store, notes.txt)
    # in the data root must not abort the whole ingest.
    action_dirs = sorted(
        (d for d in os.listdir(data_root)
         if d.isdigit() and os.path.isdir(os.path.join(data_root, d))),
        key=int)
    proc = FrameProcessor(pc_no, rng, joint_selection, skeleton,
                          initial_body_unit)

    # Enumerate the full walk first (cheap directory listing), then stream
    # the heavy .mat parses through the ordered prefetcher.
    snippets = []
    for act, action_name in enumerate(action_dirs):
        action_path = os.path.join(data_root, action_name)
        # Enumerate directories only: a stray FILE must not consume a j slot
        # (j==0 drives the first-snippet skip below).
        snippet_names = [s for s in sorted(os.listdir(action_path))
                         if os.path.isdir(os.path.join(action_path, s))]
        for j, snippet_name in enumerate(snippet_names):
            snippet_path = os.path.join(action_path, snippet_name)
            mats = sorted(glob.glob(os.path.join(snippet_path, "*.mat")),
                          key=_numeric_key)
            if not mats:
                continue
            if act == 0 and j == 0:
                # the very first snippet is skipped entirely
                # (Dataset_sample.py:134-135)
                continue
            snippets.append((act, mats))

    loaded = _iter_loaded(loadmat, [p for _, mats in snippets for p in mats],
                          workers=_ingest_workers())
    for snip_id, (act, mats) in enumerate(snippets):
        frames = {k: [] for k in ARRAY_KEYS if k not in _WINDOW_KEYS}
        for mat_path in mats:
            frame = proc.process(next(loaded))
            if frame is None:
                continue
            # f32 casts are deferred to the final pack (ingest() stacks then
            # casts once; a single f64->f32 rounding is bit-identical to the
            # old per-frame cast and saves ~3 s of astype overhead).
            for k in frames:
                frames[k].append(frame[k])

        # Tail-first non-overlapping windowing (Dataset_sample.py:235-262).
        # win_pos counts windows cut from this snippet so far (0 = the
        # snippet tail); together with the global snippet id it lets the
        # overlap augmenter (train/augment.py) find time-adjacent windows.
        win_pos = 0
        while len(frames["cloud"]) >= frame_no:
            for k in frames:
                out[k].append(np.stack(frames[k][-frame_no:]))
                frames[k] = frames[k][:-frame_no]
            out["bones"].append(proc.body_length)
            out["action"].append(act)
            out["snippet"].append(snip_id)
            out["win_pos"].append(win_pos)
            win_pos += 1

    return out, proc.initial_body_unit


_SOURCE_TAG = None


def _source_tag() -> str:
    """Cache tag derived from this module's own source bytes: ANY edit to
    the loader invalidates every cache by construction, replacing the old
    hand-bumped ``"v1"`` (which silently served stale windows whenever
    loader logic changed without a bump).  Over-invalidation -- a comment
    edit forces one re-ingest (~7 s with the native reader) -- is the cheap
    side of that trade."""
    global _SOURCE_TAG
    if _SOURCE_TAG is None:
        path = os.path.abspath(__file__)
        if path.endswith(".pyc"):       # some launchers point at bytecode
            path = path[:-1]
        with open(path, "rb") as f:
            _SOURCE_TAG = hashlib.sha1(f.read()).hexdigest()[:10]
    return _SOURCE_TAG


def _param_key(data_root: str, frame_no: int, pc_no: int, padding_seed: int,
               layout: str) -> str:
    h = hashlib.sha1()
    h.update(os.path.abspath(data_root).encode())
    h.update(f"|{frame_no}|{pc_no}|{padding_seed}|{layout}".encode())
    return h.hexdigest()[:16]


def cache_key(data_root: str, frame_no: int, pc_no: int, padding_seed: int,
              layout: str = "sample") -> str:
    """``<param-hash>_<source-tag>``: the parameter hash names the logical
    dataset, the source tag invalidates on any loader edit.  Keeping them
    separate lets ``load_or_ingest`` prune the previous revision's cache of
    the SAME parameters when it writes a new one (the source tag otherwise
    orphans one multi-hundred-MB npz per loader edit)."""
    return (_param_key(data_root, frame_no, pc_no, padding_seed, layout)
            + "_" + _source_tag())


def load_or_ingest(data_root: str, cache_dir: str, frame_no: int = 20,
                   pc_no: int = 128, padding_seed: int = 0,
                   verbose: bool = True,
                   layout: str = "sample") -> Dict[str, np.ndarray]:
    """Cached ingest: one .npz per (root, frame_no, pc_no, seed, layout)."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(
        cache_dir,
        f"mmego_{cache_key(data_root, frame_no, pc_no, padding_seed, layout)}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    if verbose:
        print(f"[ingest] packing {data_root} -> {path}")
    packed = ingest(data_root, frame_no, pc_no, padding_seed, layout=layout)
    np.savez_compressed(path, **packed)
    # Prune the previous loader revisions' caches of the SAME parameters
    # (identical param-hash prefix, different source tag) -- without this,
    # every loader edit would orphan one full packed npz forever.
    param = _param_key(data_root, frame_no, pc_no, padding_seed, layout)
    for old in glob.glob(os.path.join(cache_dir, f"mmego_{param}_*.npz")):
        if os.path.abspath(old) != os.path.abspath(path):
            os.remove(old)
    # Legacy single-hash cache names (pre round-5, source tag folded into
    # one hex string) can never match any current key -- dead by
    # construction, prune them too.
    for old in glob.glob(os.path.join(cache_dir, "mmego_*.npz")):
        if re.fullmatch(r"mmego_[0-9a-f]{16}\.npz", os.path.basename(old)):
            os.remove(old)
    return packed


def load_window_meta(data_root: str, cache_dir: str, frame_no: int = 20,
                     pc_no: int = 128, padding_seed: int = 0,
                     layout: str = "sample"):
    """The per-window ``(snippet, win_pos)`` metadata + window count,
    WITHOUT decompressing the bulk arrays: npz members load lazily on
    access, so reading three tiny int32 vectors costs ~ nothing (the
    overlap augmenter needs only these; a full ``load_or_ingest`` here
    decompressed hundreds of MB per trainer invocation)."""
    path = os.path.join(
        cache_dir,
        f"mmego_{cache_key(data_root, frame_no, pc_no, padding_seed, layout)}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return z["snippet"], z["win_pos"], len(z["action"])
    packed = load_or_ingest(data_root, cache_dir, frame_no, pc_no,
                            padding_seed, verbose=False, layout=layout)
    return packed["snippet"], packed["win_pos"], len(packed["action"])
