"""ctypes bridge to the C++ binned-SAH BVH builder (rt_tpu/bvh/cpp).

The reference's equivalent is the compiled Rust `bvh` crate with its SIMD
feature (Cargo.toml:14,23-24).  Ours is a small C++17 shared library built
with g++ (see rt_tpu/bvh/cpp/build.sh); this module loads it lazily and
falls back to the NumPy builder when the library hasn't been compiled.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), "cpp")
_LIB_PATH = os.path.join(_LIB_DIR, "libbvh.so")
_lib = None
_load_failed = False


def _try_load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_LIB_DIR, "bvh_builder.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["bash", os.path.join(_LIB_DIR, "build.sh")],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _load_failed = True
                return
        else:
            _load_failed = True
            return
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.bvh_build.restype = ctypes.c_int
        lib.bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # mins [P*3]
            ctypes.POINTER(ctypes.c_float),  # maxs [P*3]
            ctypes.c_int,  # P
            ctypes.c_int,  # leaf_size
            ctypes.POINTER(ctypes.c_float),  # out node_min [2P*3]
            ctypes.POINTER(ctypes.c_float),  # out node_max
            ctypes.POINTER(ctypes.c_int),  # out hit_next
            ctypes.POINTER(ctypes.c_int),  # out miss_next
            ctypes.POINTER(ctypes.c_int),  # out leaf_start
            ctypes.POINTER(ctypes.c_int),  # out leaf_count
            ctypes.POINTER(ctypes.c_int),  # out prim_order [P]
        ]
        _lib = lib
    except OSError:
        _load_failed = True


def available() -> bool:
    _try_load()
    return _lib is not None


def build(mins: np.ndarray, maxs: np.ndarray, leaf_size: int):
    """Build via the C++ library; same array contract as the NumPy builder."""
    _try_load()
    assert _lib is not None
    p = mins.shape[0]
    cap = max(2 * p, 1)
    mins = np.ascontiguousarray(mins, np.float32)
    maxs = np.ascontiguousarray(maxs, np.float32)
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    hit_next = np.empty((cap,), np.int32)
    miss_next = np.empty((cap,), np.int32)
    leaf_start = np.empty((cap,), np.int32)
    leaf_count = np.empty((cap,), np.int32)
    prim_order = np.empty((max(p, 1),), np.int32)

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    n_nodes = _lib.bvh_build(
        mins.ctypes.data_as(fp),
        maxs.ctypes.data_as(fp),
        p,
        leaf_size,
        node_min.ctypes.data_as(fp),
        node_max.ctypes.data_as(fp),
        hit_next.ctypes.data_as(ip),
        miss_next.ctypes.data_as(ip),
        leaf_start.ctypes.data_as(ip),
        leaf_count.ctypes.data_as(ip),
        prim_order.ctypes.data_as(ip),
    )
    if n_nodes <= 0:
        raise RuntimeError("bvh_build failed")
    return (
        node_min[:n_nodes],
        node_max[:n_nodes],
        hit_next[:n_nodes],
        miss_next[:n_nodes],
        leaf_start[:n_nodes],
        leaf_count[:n_nodes],
        prim_order,
    )
