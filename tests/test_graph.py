import os

import numpy as np
import pytest

from mmego_tpu.ops import graph

_LOWER_CKPT = os.path.join(
    os.path.dirname(__file__), "..", "..", "reference", "Resource",
    "Pretrained_model", "Lower_Net", "epoch161_batch20frame20lr0.0003.pth")


def test_distance_adjacency_shape_and_partition():
    a = graph.build_adjacency("distance")
    assert a.shape == (2, 15, 15)
    # hop-0 slice is diagonal-only, hop-1 has zero diagonal
    assert np.count_nonzero(a[0] - np.diag(np.diag(a[0]))) == 0
    assert np.allclose(np.diag(a[1]), 0.0)
    # the summed stack is the normalized adjacency: symmetric, rows > 0
    full = a.sum(axis=0)
    np.testing.assert_allclose(full, full.T, atol=1e-7)


def test_uniform_equals_distance_sum():
    np.testing.assert_allclose(
        graph.build_adjacency("uniform")[0],
        graph.build_adjacency("distance").sum(axis=0), atol=1e-7)


def test_spatial_strategy_builds():
    a = graph.build_adjacency("spatial")
    assert a.ndim == 3 and a.shape[1:] == (15, 15)


@pytest.mark.skipif(not os.path.exists(_LOWER_CKPT), reason="reference ckpt absent")
def test_distance_adjacency_matches_shipped_checkpoint():
    torch = pytest.importorskip("torch")
    sd = torch.load(_LOWER_CKPT, map_location="cpu")
    want = sd["keyEncoder.gcn.A"].numpy()
    got = graph.build_adjacency("distance")
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
