"""Full-dataset layout ingest: per-subject recalibration + subject labels."""

import os

import numpy as np
import pytest
import scipy.io as scio

from mmego_tpu.data import ingest as ingest_mod


def _write_frames(d, rng, n_frames, scale=1.0):
    os.makedirs(d, exist_ok=True)
    for i in range(n_frames):
        key32 = rng.randn(32, 3) * scale
        scio.savemat(os.path.join(d, f"ti_imu_key_{i:03d}.mat"), {
            "pc_xyziv_ti2": rng.randn(40, 5),
            "pc_xyz_key_2": key32,
            "imu_save_l": rng.randn(20, 15),
            "orientation_imu_img": np.eye(3),
            "R_btc": np.eye(3),
            "t_R0R": rng.randn(1, 3),
            "abcd_ground_2": np.asarray([[-1.0, 0, 0, 1.0]]),
            "foot_contact": np.asarray([[1, 0]], dtype=np.uint8),
        })


@pytest.fixture
def full_tree(tmp_path):
    rng = np.random.RandomState(0)
    for subj, scale in (("s1", 1.0), ("s2", 1.5)):
        for act in ("01", "02"):
            for snip in ("01", "02"):
                _write_frames(str(tmp_path / subj / act / snip), rng, 8,
                              scale=scale)
    return str(tmp_path)


def test_full_layout_subjects_and_actions(full_tree):
    # Stray non-numeric entries in a subject dir (editor droppings, notes)
    # must be skipped, not crash the `sorted(..., key=int)` walk.
    with open(os.path.join(full_tree, "s1", ".DS_Store"), "w") as f:
        f.write("junk")
    packed = ingest_mod.ingest(full_tree, frame_no=4, pc_no=16, layout="full")
    # per subject: first snippet of first action skipped -> 3 snippets x 2
    # windows of 4 frames = 6 windows; 2 subjects -> 12
    assert len(packed["cloud"]) == 12
    assert set(packed["subject"].tolist()) == {0, 1}
    assert packed["subject"].tolist() == [0] * 6 + [1] * 6
    assert packed["cloud"].shape[1:] == (4, 16, 6)


def test_full_layout_per_subject_bone_rescale(full_tree):
    packed = ingest_mod.ingest(full_tree, frame_no=4, pc_no=16, layout="full")
    b0 = packed["bones"][0]     # subject 1 bones
    b1 = packed["bones"][-1]    # subject 2 bones
    # directions identical (frozen from first subject), magnitudes differ
    d0 = b0 / np.linalg.norm(b0, axis=-1, keepdims=True)
    d1 = b1 / np.linalg.norm(b1, axis=-1, keepdims=True)
    np.testing.assert_allclose(d0, d1, rtol=1e-4, atol=1e-5)
    assert not np.allclose(np.linalg.norm(b0, axis=-1),
                           np.linalg.norm(b1, axis=-1))


def test_sample_layout_unchanged(full_tree):
    # a single subject dir treated as layout='sample' root
    packed = ingest_mod.ingest(os.path.join(full_tree, "s1"),
                               frame_no=4, pc_no=16, layout="sample")
    assert len(packed["cloud"]) == 6
    assert "subject" not in packed
