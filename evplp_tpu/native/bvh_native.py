"""ctypes bindings for the native (C++) BVH builder.

Compiled on first use with g++ (no pybind11 in the image); the .so is
cached next to the source and rebuilt when the source is newer.  The numpy
fallback in accel/bvh.py is used when compilation is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bvh_builder.cpp")
_SO = os.path.join(_DIR, "libevplp_bvh.so")
_lock = threading.Lock()
_lib = None


def _ensure_compiled() -> str:
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               "-o", _SO + ".tmp", _SRC]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(_SO + ".tmp", _SO)
    return _SO


def _get_lib():
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_ensure_compiled())
            lib.evplp_build_bvh.restype = ctypes.c_int
            lib.evplp_build_bvh.argtypes = [
                ctypes.POINTER(ctypes.c_float)] * 3 + [
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            _lib = lib
    return _lib


def build(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray, leaf_size: int):
    """-> (node_min, node_max, skip, first, count, perm) host arrays."""
    lib = _get_lib()
    num_tris = int(v0.shape[0])
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)

    # ~4*N/leaf nodes in practice; the retry loop re-allocates exactly on
    # overflow (builder returns -total), so undersizing is safe and avoids
    # gigabyte-scale scratch at the 12M-triangle capacity tier.
    max_nodes = max(8, 4 * num_tris // max(leaf_size, 1) + 64)
    for _ in range(2):
        node_min = np.empty((max_nodes, 3), np.float32)
        node_max = np.empty((max_nodes, 3), np.float32)
        skip = np.empty((max_nodes,), np.int32)
        first = np.empty((max_nodes,), np.int32)
        count = np.empty((max_nodes,), np.int32)
        perm = np.empty((num_tris,), np.int32)

        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int)
        n = lib.evplp_build_bvh(
            v0.ctypes.data_as(fp), v1.ctypes.data_as(fp),
            v2.ctypes.data_as(fp), num_tris, leaf_size, max_nodes,
            node_min.ctypes.data_as(fp), node_max.ctypes.data_as(fp),
            skip.ctypes.data_as(ip), first.ctypes.data_as(ip),
            count.ctypes.data_as(ip), perm.ctypes.data_as(ip))
        if n >= 0:
            return (node_min[:n], node_max[:n], skip[:n], first[:n],
                    count[:n], perm.astype(np.int64))
        max_nodes = -n
    raise RuntimeError("native BVH build failed to allocate")
