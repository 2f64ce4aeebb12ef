"""ctypes bindings for the native host ops (csrc/hostops.cpp).

Falls back to numpy implementations when the shared library has not been
built (`make -C csrc`). The numpy fallback is bit-identical for hashing.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "csrc", "libcdseg_hostops.so",
    )
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        lib.fnv_hash_rows.argtypes = [i32p, ctypes.c_int64, u64p]
        lib.grid_sample_pick.restype = ctypes.c_int64
        lib.grid_sample_pick.argtypes = [u64p, ctypes.c_int64, i64p, i64p, i64p]
        lib.knn_host.argtypes = [
            f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_int64,
            i64p, f32p,
        ]
        _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def fnv_hash(grid: np.ndarray) -> np.ndarray:
    lib = _load()
    grid = np.ascontiguousarray(grid, np.int32)
    if lib is None:
        from cdsegnet_tpu.data.transforms import fnv_hash_vec

        return fnv_hash_vec(grid)
    out = np.empty(grid.shape[0], np.uint64)
    lib.fnv_hash_rows(grid, grid.shape[0], out)
    return out


def grid_sample_pick(
    keys: np.ndarray, offsets: np.ndarray
) -> np.ndarray:
    """One index per occupied voxel; `offsets` rotates the in-voxel pick."""
    lib = _load()
    n = keys.shape[0]
    keys = np.ascontiguousarray(keys, np.uint64)
    offsets = np.ascontiguousarray(offsets, np.int64)
    if lib is None:
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        _, inverse, counts = np.unique(ks, return_inverse=True, return_counts=True)
        starts = np.cumsum(np.insert(counts, 0, 0))[:-1]
        off = offsets[: counts.size] % counts
        return order[starts + off]
    order = np.empty(n, np.int64)
    sel = np.empty(n, np.int64)
    m = lib.grid_sample_pick(keys, n, offsets, order, sel)
    return sel[:m]


def knn_host(query: np.ndarray, ref: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    query = np.ascontiguousarray(query, np.float32)
    ref = np.ascontiguousarray(ref, np.float32)
    if lib is None:
        d2 = ((query[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
        idx = np.argsort(d2, axis=1)[:, :k]
        return idx.astype(np.int64), np.take_along_axis(d2, idx, 1).astype(np.float32)
    m = query.shape[0]
    idx = np.empty((m, k), np.int64)
    dist = np.empty((m, k), np.float32)
    lib.knn_host(query, m, ref, ref.shape[0], k, idx, dist)
    return idx, dist
