"""ctypes bindings for the native host library (native/libqaray_native.so).

The reference's host-side runtime is C++ (cyBVH build, tinyobjloader,
lodepng); this is the framework's native equivalent. Every entry point has a
pure-python fallback — callers use `bvh_build_native()` etc. and get None
when the library is unavailable, at which point the NumPy path runs.

The library is auto-built on first import when a toolchain is present
(`make -C native`); failures degrade silently to the fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libqaray_native.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    ip = ctypes.POINTER(ctypes.c_int)

    lib.qn_bvh_build.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ip, ip,
    ]
    lib.qn_bvh_build.restype = ctypes.c_int
    lib.qn_bvh_fetch.argtypes = [f32p, i32p, i32p, i32p, i32p]
    lib.qn_bvh_fetch.restype = ctypes.c_int
    lib.qn_png_write.argtypes = [
        ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.qn_png_write.restype = ctypes.c_int
    lib.qn_obj_load.argtypes = [ctypes.c_char_p, ip, ip, ip, ip]
    lib.qn_obj_load.restype = ctypes.c_int
    lib.qn_obj_fetch.argtypes = [f32p, f32p, f32p, i32p, i32p, i32p]
    lib.qn_obj_fetch.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def bvh_build_native(tri_verts: np.ndarray, max_leaf: int, method: str = "sah"):
    """Returns (bounds, left, right, count, elems) or None."""
    lib = _load()
    if lib is None:
        return None
    tv = np.ascontiguousarray(tri_verts.reshape(-1, 9), np.float32)
    n_nodes = ctypes.c_int()
    n_elems = ctypes.c_int()
    m = 1 if method == "sah" else 0
    if lib.qn_bvh_build(tv, tv.shape[0], max_leaf, m,
                        ctypes.byref(n_nodes), ctypes.byref(n_elems)) != 0:
        return None
    bounds = np.empty((n_nodes.value, 6), np.float32)
    left = np.empty(n_nodes.value, np.int32)
    right = np.empty(n_nodes.value, np.int32)
    count = np.empty(n_nodes.value, np.int32)
    elems = np.empty(max(n_elems.value, 1), np.int32)
    if lib.qn_bvh_fetch(bounds, left, right, count, elems) != 0:
        return None
    return bounds, left, right, count, elems[: n_elems.value]


def png_write_native(path: str, array: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    arr = np.ascontiguousarray(array, np.uint8)
    h, w = arr.shape[:2]
    comps = 1 if arr.ndim == 2 else arr.shape[2]
    return lib.qn_png_write(path.encode(), arr.reshape(-1), w, h, comps) == 0


def obj_load_native(path: str):
    """Returns (v, vn, vt, f_v, f_vt, f_vn) arrays or None."""
    lib = _load()
    if lib is None:
        return None
    nv = ctypes.c_int()
    nvn = ctypes.c_int()
    nvt = ctypes.c_int()
    nf = ctypes.c_int()
    if lib.qn_obj_load(path.encode(), ctypes.byref(nv), ctypes.byref(nvn),
                       ctypes.byref(nvt), ctypes.byref(nf)) != 0:
        return None
    v = np.empty((max(nv.value, 1), 3), np.float32)
    vn = np.empty((max(nvn.value, 1), 3), np.float32)
    vt = np.empty((max(nvt.value, 1), 2), np.float32)
    f_v = np.empty((max(nf.value, 1), 3), np.int32)
    f_vt = np.empty((max(nf.value, 1), 3), np.int32)
    f_vn = np.empty((max(nf.value, 1), 3), np.int32)
    if lib.qn_obj_fetch(v, vn, vt, f_v, f_vt, f_vn) != 0:
        return None
    return (
        v[: nv.value],
        vn[: nvn.value],
        vt[: nvt.value],
        f_v[: nf.value],
        f_vt[: nf.value],
        f_vn[: nf.value],
    )
