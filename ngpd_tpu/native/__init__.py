"""ctypes bindings for the native host runtime (ngpd_native.cpp).

Builds the shared library on first use with g++ (no pybind11 in the
image); every entry point degrades gracefully to the pure-Python path
when no compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "ngpd_native.cpp"
_LIB_PATH = _DIR / "libngpd_native.so"
_lib = None
_build_failed = False


def _build() -> Optional[Path]:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        str(_SRC), "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return _LIB_PATH
    except Exception:
        # Retry without -march/-fopenmp for maximum portability.
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB_PATH)],
                check=True, capture_output=True, timeout=180,
            )
            return _LIB_PATH
        except Exception:
            return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
        if _build() is None:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _build_failed = True
        return None
    lib.obj_load.restype = ctypes.c_void_p
    lib.obj_load.argtypes = [ctypes.c_char_p]
    for name in ("obj_nv", "obj_nn", "obj_nf"):
        getattr(lib, name).restype = ctypes.c_int64
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.obj_has_fn.restype = ctypes.c_int
    lib.obj_has_fn.argtypes = [ctypes.c_void_p]
    for name in ("obj_v", "obj_vn"):
        getattr(lib, name).restype = ctypes.POINTER(ctypes.c_float)
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    for name in ("obj_fv", "obj_fn"):
        getattr(lib, name).restype = ctypes.POINTER(ctypes.c_int32)
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.obj_free.restype = None
    lib.obj_free.argtypes = [ctypes.c_void_p]
    lib.grid_knn.restype = ctypes.c_int
    lib.grid_knn.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def native_read_obj(path: str | Path):
    """Fast OBJ parse -> (v, vn, fv, fn) numpy arrays, or None."""
    lib = get_lib()
    if lib is None:
        return None
    handle = lib.obj_load(str(path).encode())
    if not handle:
        return None
    try:
        nv, nn, nf = lib.obj_nv(handle), lib.obj_nn(handle), lib.obj_nf(handle)
        v = np.ctypeslib.as_array(lib.obj_v(handle), (max(nv, 1), 3))[:nv].copy()
        vn = np.ctypeslib.as_array(lib.obj_vn(handle), (max(nn, 1), 3))[:nn].copy()
        fv = np.ctypeslib.as_array(lib.obj_fv(handle), (max(nf, 1), 3))[:nf].copy()
        if lib.obj_has_fn(handle) and nf:
            fn = np.ctypeslib.as_array(lib.obj_fn(handle), (nf, 3)).copy()
        else:
            fn = np.zeros((0, 3), np.int32)
        return (
            v.astype(np.float32),
            vn.astype(np.float32),
            fv.astype(np.int32),
            fn.astype(np.int32),
        )
    finally:
        lib.obj_free(handle)


def native_grid_knn(
    points: np.ndarray, k: int, queries: Optional[np.ndarray] = None
):
    """Exact CPU kNN -> (idx (Q, k), sqdist (Q, k)), or None."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    q = pts if queries is None else np.ascontiguousarray(queries, np.float32)
    nq = len(q)
    idx = np.empty((nq, k), np.int32)
    d = np.empty((nq, k), np.float32)
    rc = lib.grid_knn(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nq,
        k,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        return None
    return idx, d
