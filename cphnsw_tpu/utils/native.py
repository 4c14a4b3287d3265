"""ctypes loader for the native host-ops library (native/hostops.c).

Compiles on demand with the system C compiler (cached .so under
.native_cache/); every native entry point has a pure-numpy fallback, so a
missing toolchain only costs speed.  pybind11 is not available in this
image, hence ctypes + a plain C ABI.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _ROOT / "native" / "hostops.c"
_CACHE = _ROOT / ".native_cache"

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            _CACHE.mkdir(exist_ok=True)
            so = _CACHE / "hostops.so"
            if not so.exists() or so.stat().st_mtime < _SRC.stat().st_mtime:
                cc = os.environ.get("CC", "cc")
                subprocess.run(
                    [cc, "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(so)],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(str(so))
            lib.bfs_order.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.reverse_topk.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def bfs_order(ids: np.ndarray, entry: int) -> np.ndarray | None:
    """Native BFS renumbering; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    ids = np.ascontiguousarray(ids, dtype=np.int32)
    n, r = ids.shape
    out = np.empty(n, dtype=np.int64)
    lib.bfs_order(
        _ptr(ids, ctypes.c_int32), n, r, int(entry),
        _ptr(out, ctypes.c_int64),
    )
    return out


def reverse_topk(
    ids: np.ndarray, dists: np.ndarray, r_rev: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """Native capped reverse-edge lists; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    ids = np.ascontiguousarray(ids, dtype=np.int32)
    dists = np.ascontiguousarray(dists, dtype=np.float32)
    n, r = ids.shape
    out_ids = np.full((n, r_rev), -1, dtype=np.int32)
    out_d = np.full((n, r_rev), np.finfo(np.float32).max, dtype=np.float32)
    lib.reverse_topk(
        _ptr(ids, ctypes.c_int32), _ptr(dists, ctypes.c_float),
        n, r, r_rev, _ptr(out_ids, ctypes.c_int32),
        _ptr(out_d, ctypes.c_float),
    )
    return out_ids, out_d
