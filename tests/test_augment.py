"""Train-time augmentation: phase-shifted overlap windows + cloud jitter."""

import numpy as np
import jax
import pytest
from unittest import mock

from mmego_tpu.train import augment

from _helpers import tiny_windows


def test_overlap_pairs_and_maps():
    """Pairing: only same-snippet, time-adjacent, both-in-train pairs; the
    index maps reconstruct a contiguous slice of concat(earlier, later)."""
    # 6 global windows: snippet 0 has win_pos 2,1,0 (= pack order of a
    # 3-window snippet), snippet 1 has 1,0; snippet 2 has 0 (unpairable).
    snippet = np.array([0, 0, 0, 1, 1, 2])
    win_pos = np.array([2, 1, 0, 1, 0, 0])
    # train split drops global window 3 -> snippet-1 pair unusable.
    train_idx = np.array([5, 0, 1, 2, 4])       # split rows 0..4
    L = 4
    aug = augment.OverlapAugmenter(snippet, win_pos, train_idx, L)
    # usable pairs: (wp1, wp0)=(g1,g2) and (wp2, wp1)=(g0,g1), rows in split
    got = {(int(e), int(l)) for e, l in zip(aug.earlier, aug.later)}
    assert got == {(2, 3), (1, 2)}              # split rows of (earlier, later)

    win, frm = aug.index_maps(np.random.RandomState(0))
    assert win.shape == frm.shape == (2, L)
    for p in range(2):
        e, l = aug.earlier[p], aug.later[p]
        k = int(frm[p, 0])
        assert 1 <= k < L
        # concat(earlier, later)[k:k+L] row by row
        for t in range(L):
            src = e if k + t < L else l
            assert win[p, t] == src
            assert frm[p, t] == (k + t) % L


def test_overlap_augmented_arrays_are_true_windows():
    """The synthesised windows must be frame-exact slices of the concatenated
    pair -- checked against a numpy reconstruction."""
    rng = np.random.RandomState(1)
    L = 4
    data = tiny_windows(rng, 6, l=L)
    snippet = np.array([0, 0, 0, 0, 1, 1])
    win_pos = np.array([3, 2, 1, 0, 1, 0])
    train_idx = np.arange(6)                    # everything in train
    aug = augment.OverlapAugmenter(snippet, win_pos, train_idx, L)
    assert aug.n_pairs == 4

    fields = ("cloud", "key", "imu", "bones")
    arrays = [getattr(data, f) for f in fields]
    rs = np.random.RandomState(2)
    win, frm = augment.OverlapAugmenter.index_maps(aug, rs)
    out = aug.augmented_arrays(arrays, fields,
                               np.random.RandomState(2))   # same draw
    for name, a, o in zip(fields, arrays, out):
        o = np.asarray(o)
        assert o.shape[0] == 6 + aug.n_pairs
        np.testing.assert_array_equal(o[:6], a)             # originals intact
        for p in range(aug.n_pairs):
            if name == "bones":
                np.testing.assert_array_equal(o[6 + p], a[aug.earlier[p]])
            else:
                want = np.stack([a[win[p, t], frm[p, t]] for t in range(L)])
                np.testing.assert_array_equal(o[6 + p], want)


def test_jitter_cloud_masks_and_range():
    rng = np.random.RandomState(3)
    cloud = rng.randn(2, 3, 8, 6).astype(np.float32)
    cloud[0, 0, 2] = 0.0                        # a padding row
    out = np.asarray(augment.jitter_cloud(
        jax.numpy.asarray(cloud), 0.05, jax.random.PRNGKey(0)))
    assert np.all(out[0, 0, 2] == 0.0)          # padding stays exactly zero
    assert not np.allclose(out[..., 0:3], cloud[..., 0:3])  # xyz moved
    np.testing.assert_allclose(                  # range recomputed
        out[..., 3], np.linalg.norm(out[..., 0:3], axis=-1), rtol=1e-5)
    np.testing.assert_array_equal(out[..., 4:6], cloud[..., 4:6])


def test_train_upper_with_augmentation_smoke(tmp_path, monkeypatch):
    """One augmented epoch end-to-end: the overlap view enlarges the epoch
    and the jitter path traces; loss finite, params update."""
    from mmego_tpu.checkpoint import store
    from mmego_tpu.config import Config
    from mmego_tpu.data import ingest as ingest_mod
    from mmego_tpu.models import imu_net
    from mmego_tpu.train import loop

    monkeypatch.setenv("MMEGO_DP", "off")
    rng = np.random.RandomState(4)
    W, L = 20, 4
    monkeypatch.setattr(
        ingest_mod, "load_window_meta",
        lambda *a, **k: (np.repeat(np.arange(5), 4),
                         np.tile(np.arange(4)[::-1], 5), W))
    perm = loop.dataset_mod._reference_permutation(W, 1)
    train_rows = perm[:16]
    data = {"train": tiny_windows(rng, 16, l=L), "test": tiny_windows(rng, 8, l=L)}
    monkeypatch.setattr(loop.dataset_mod, "load_split",
                        lambda c, split: data[split])

    cfg = Config(idx=88, frame_no=L, pc_no=16, lower_pc_no=8, batch_size=8,
                 early_stop_patience=100, save_slot=100,
                 report_root=str(tmp_path / "runs"),
                 model_imu_path=str(tmp_path / "imu.npz"),
                 augment_overlap=True, augment_cloud_sigma=0.01)
    orig_init = imu_net.imu_net_init
    with mock.patch.object(loop.imu_net, "imu_net_init",
                           lambda r: orig_init(r, hidden=16)):
        store.save(cfg.model_imu_path,
                   loop.imu_net.imu_net_init(jax.random.PRNGKey(0)))
        seen = []
        orig_view = loop._augmented_epoch_view

        def spy(train, aug, fields, seed, epoch):
            v = orig_view(train, aug, fields, seed, epoch)
            seen.append(len(v))
            return v

        monkeypatch.setattr(loop, "_augmented_epoch_view", spy)
        (params, _), _ = loop.train_upper(cfg, max_epochs=1, verbose=False)
    assert seen and seen[0] > 16     # epoch actually enlarged
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(params))
