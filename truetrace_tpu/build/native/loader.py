"""ctypes loader for the native builders (no pybind11 in this image)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libttnative.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def make_native(force: bool = False) -> bool:
    """Compile bvh2.cpp -> libttnative.so. Returns success."""
    if os.path.exists(_SO) and not force:
        return True
    src = os.path.join(_DIR, "bvh2.cpp")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", src, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
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
