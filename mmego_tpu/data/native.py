"""ctypes binding for the native MAT 5 reader (native/matreader.cc).

Provides ``loadmat(path) -> {name: np.ndarray}`` with scipy-compatible array
shapes (MATLAB column-major dims preserved).  The shared library is built on
first use with the repo's Makefile (g++ + zlib); if the toolchain or build is
unavailable the caller falls back to ``scipy.io.loadmat`` transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libmatreader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_SO_PATH) and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _lib_failed = True
            return None
        lib.mat_open.restype = ctypes.c_void_p
        lib.mat_open.argtypes = [ctypes.c_char_p]
        lib.mat_num_vars.restype = ctypes.c_int
        lib.mat_num_vars.argtypes = [ctypes.c_void_p]
        lib.mat_var_name.restype = ctypes.c_char_p
        lib.mat_var_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.mat_var_ndim.restype = ctypes.c_int
        lib.mat_var_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.mat_var_dims.restype = ctypes.POINTER(ctypes.c_int64)
        lib.mat_var_dims.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.mat_var_data.restype = ctypes.POINTER(ctypes.c_double)
        lib.mat_var_data.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.mat_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def loadmat(path: str, keys=None) -> Dict[str, np.ndarray]:
    """Read numeric real variables of a MAT 5 file (all, or only ``keys``).

    Raises IOError if the native library is unavailable or the file fails to
    parse (callers fall back to scipy).

    The hot loop is deliberately lean -- this runs 8 variables x 19,208 files
    per cold ingest, so per-variable Python overhead (ctypeslib.as_array,
    np.prod, str decode) used to dominate the whole walk.  Each variable is
    now one ``ctypes.memmove`` into a writable array plus a column-major
    reshape view.
    """
    lib = get_lib()
    if lib is None:
        raise IOError("native matreader unavailable")
    kb = None if keys is None else frozenset(k.encode() for k in keys)
    num_vars, var_name = lib.mat_num_vars, lib.mat_var_name
    var_ndim, var_dims = lib.mat_var_ndim, lib.mat_var_dims
    var_data, memmove = lib.mat_var_data, ctypes.memmove
    h = lib.mat_open(path.encode())
    if not h:
        raise IOError(f"native matreader failed to parse {path}")
    try:
        out: Dict[str, np.ndarray] = {}
        for i in range(num_vars(h)):
            name = var_name(h, i)
            if kb is not None and name not in kb:
                continue
            dptr = var_dims(h, i)
            dims = [dptr[d] for d in range(var_ndim(h, i))]
            count = 1
            for d in dims:
                count *= d
            flat = np.empty(count, np.float64)
            memmove(flat.ctypes.data, var_data(h, i), count * 8)
            # MATLAB stores column-major; scipy returns the same logical shape
            out[name.decode()] = flat.reshape(dims, order="F")
        return out
    finally:
        lib.mat_close(h)
