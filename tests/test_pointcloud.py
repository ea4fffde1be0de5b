import numpy as np
import jax.numpy as jnp

from mmego_tpu.ops import pointcloud


def test_select_top_x_keeps_largest_x_set():
    rng = np.random.RandomState(0)
    pts = rng.randn(3, 128, 6).astype(np.float32)
    out = np.asarray(pointcloud.select_top_x(jnp.asarray(pts), 64))
    assert out.shape == (3, 64, 6)
    for b in range(3):
        want = set(np.argsort(-pts[b, :, 0])[:64].tolist())
        # match rows by x value set
        got_x = sorted(out[b, :, 0].tolist())
        want_x = sorted(pts[b, list(want), 0].tolist())
        np.testing.assert_allclose(got_x, want_x)


def test_square_distance_masks_zero_padding():
    src = jnp.asarray([[[0.0, 0, 0], [1, 0, 0]]])
    dst = jnp.asarray([[[1.0, 0, 0], [0, 0, 0]]])  # second point is padding
    d = np.asarray(pointcloud.square_distance(src, dst))
    assert d.shape == (1, 2, 2)
    np.testing.assert_allclose(d[0, :, 0], [1.0, 0.0], atol=1e-6)
    assert np.isinf(d[0, :, 1]).all()


def test_ball_group_nearest():
    rng = np.random.RandomState(1)
    xyz = rng.randn(2, 32, 3).astype(np.float32)
    anchors = rng.randn(2, 4, 3).astype(np.float32)
    idx = np.asarray(pointcloud.ball_group(8, jnp.asarray(xyz), jnp.asarray(anchors)))
    assert idx.shape == (2, 4, 8)
    for b in range(2):
        for s in range(4):
            d = np.sum((xyz[b] - anchors[b, s]) ** 2, axis=-1)
            want = set(np.argsort(d)[:8].tolist())
            assert set(idx[b, s].tolist()) == want


def test_anchor_grid_shape_and_corners():
    g = np.asarray(pointcloud.anchor_grid())
    assert g.shape == (3, 3, 3, 3)
    np.testing.assert_allclose(g[0, 0, 0], [0.0, -0.3, -0.3], atol=1e-6)
    np.testing.assert_allclose(g[2, 2, 2], [0.6, 0.3, 0.3], atol=1e-6)


def test_anchor_grouping_features():
    rng = np.random.RandomState(2)
    xyz = rng.randn(1, 16, 3).astype(np.float32)
    feats = rng.randn(1, 16, 5).astype(np.float32)
    anchors = rng.randn(1, 2, 3).astype(np.float32)
    out = np.asarray(pointcloud.anchor_grouping(
        jnp.asarray(anchors), 4, jnp.asarray(xyz), jnp.asarray(feats)))
    assert out.shape == (1, 2, 4, 11)
    # first 3 feats are the anchor itself
    for s in range(2):
        np.testing.assert_allclose(out[0, s, :, :3],
                                   np.broadcast_to(anchors[0, s], (4, 3)), atol=1e-6)
