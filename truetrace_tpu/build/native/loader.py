"""ctypes loader for the native builders (no pybind11 in this image)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
# versioned name: bump when the C ABI grows so a stale cached .so rebuilds
_SO = os.path.join(_DIR, "libttnative_v3.so")
_SOURCES = ("bvh2.cpp", "cwbvh.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def make_native(force: bool = False) -> bool:
    """Compile the native builders -> libttnative_v2.so. Returns success."""
    if os.path.exists(_SO) and not force:
        return True
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", *srcs, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and not make_native():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        lib.bvh2_build.restype = ctypes.c_void_p
        lib.bvh2_build.argtypes = [
            f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.bvh2_emit.argtypes = [ctypes.c_void_p, f32p, i32p, i32p, i32p]
        lib.bvh2_free.argtypes = [ctypes.c_void_p]
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C")
        lib.cwbvh_build.restype = ctypes.c_void_p
        lib.cwbvh_build.argtypes = [
            f32p, i32p, i32p, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.cwbvh_emit.argtypes = [ctypes.c_void_p, u32p, i32p, i32p, i32p,
                                   i32p, i32p, i32p]
        lib.cwbvh_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def build_bvh2_native(prim_box: np.ndarray, max_leaf: int, sah_cap: int):
    """Returns (box [N,2,3], left [N], count [N], order [T], depth) or None
    if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pb = np.ascontiguousarray(prim_box.reshape(-1, 6), np.float32)
    n = np.int32(pb.shape[0])
    n_nodes = ctypes.c_int32()
    depth = ctypes.c_int32()
    handle = lib.bvh2_build(pb, n, np.int32(max_leaf), np.int32(sah_cap),
                            ctypes.byref(n_nodes), ctypes.byref(depth))
    try:
        N = int(n_nodes.value)
        box = np.empty((N, 6), np.float32)
        left = np.empty(N, np.int32)
        count = np.empty(N, np.int32)
        order = np.empty(int(n), np.int32)
        lib.bvh2_emit(handle, box, left, count, order)
    finally:
        lib.bvh2_free(handle)
    return box.reshape(N, 2, 3), left, count, order, int(depth.value)


def build_cwbvh_native(box: np.ndarray, left: np.ndarray, count: np.ndarray,
                       p_max: int = 3):
    """CWBVH collapse of a BVH2 (build/native/cwbvh.cpp). Returns the same
    tuple as the Python collapse or None if the library is unavailable:
    (nodes [C,20] u32, tri_index [T], leaf_start [N2], depth,
     node_depth [C], slot_child [C,8], slot_tri_base [C,8],
     slot_tri_count [C,8]). p_max > 3 builds fat leaf slots (the BVH2 must
    have been built with matching max_leaf)."""
    lib = _load()
    if lib is None or not hasattr(lib, "cwbvh_build"):
        return None
    boxf = np.ascontiguousarray(box.reshape(-1, 6), np.float32)
    left = np.ascontiguousarray(left, np.int32)
    count = np.ascontiguousarray(count, np.int32)
    n2 = np.int32(boxf.shape[0])
    n_nodes = ctypes.c_int32()
    n_tri = ctypes.c_int32()
    depth = ctypes.c_int32()
    handle = lib.cwbvh_build(boxf, left, count, n2, np.int32(p_max),
                             ctypes.byref(n_nodes), ctypes.byref(n_tri),
                             ctypes.byref(depth))
    try:
        Cn = int(n_nodes.value)
        T = int(n_tri.value)
        nodes = np.empty((Cn, 20), np.uint32)
        tri_index = np.empty(T, np.int32)
        leaf_start = np.empty(int(n2), np.int32)
        node_depth = np.empty(Cn, np.int32)
        slot_child = np.empty((Cn, 8), np.int32)
        slot_tri_base = np.empty((Cn, 8), np.int32)
        slot_tri_count = np.empty((Cn, 8), np.int32)
        lib.cwbvh_emit(handle, nodes, tri_index, leaf_start, node_depth,
                       slot_child.reshape(-1), slot_tri_base.reshape(-1),
                       slot_tri_count.reshape(-1))
    finally:
        lib.cwbvh_free(handle)
    return (nodes, tri_index, leaf_start, int(depth.value), node_depth,
            slot_child, slot_tri_base, slot_tri_count)
