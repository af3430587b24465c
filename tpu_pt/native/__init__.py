"""ctypes bindings for the native (C++) runtime components.

The shared library is built on demand with the system toolchain (g++) the
first time it is needed and cached next to the sources. Everything here
degrades gracefully: if no compiler is available, callers fall back to the
pure-Python implementations (``tpu_pt.scene.objloader``,
``tpu_pt.intersect.lbvh``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libtpt_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


class _TptMesh(ctypes.Structure):
    _fields_ = [
        ("n_verts", ctypes.c_int64),
        ("verts", ctypes.POINTER(ctypes.c_float)),
        ("n_tris", ctypes.c_int64),
        ("indices", ctypes.POINTER(ctypes.c_int32)),
        ("mat_ids", ctypes.POINTER(ctypes.c_int32)),
        ("n_materials", ctypes.c_int32),
        ("mat_props", ctypes.POINTER(ctypes.c_float)),
        ("mat_names", ctypes.POINTER(ctypes.c_char)),
        ("mat_names_len", ctypes.c_int64),
        ("error", ctypes.c_char * 256),
    ]


def _build_library() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = os.path.join(_DIR, "tpt_native.cpp")
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
            if not _build_library():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.tpt_load_obj.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(_TptMesh)]
        lib.tpt_load_obj.restype = ctypes.c_int
        lib.tpt_free_mesh.argtypes = [ctypes.POINTER(_TptMesh)]
        lib.tpt_build_lbvh.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.uint8, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
        ]
        lib.tpt_build_lbvh.restype = ctypes.c_int
        lib.tpt_unfilter_png.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.uint8, flags="C"),
            np.ctypeslib.ndpointer(np.uint8, flags="C"),
        ]
        lib.tpt_unfilter_png.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def load_obj_native(path: str):
    """Parse an OBJ with the native parser.

    Returns (vertices [V,3] f32, indices [T,3] i32, mat_ids [T] i32,
    materials: list of dicts with name/diffuse/emission/ior/roughness/
    metallic) or raises RuntimeError.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    mesh = _TptMesh()
    rc = lib.tpt_load_obj(path.encode(), ctypes.byref(mesh))
    if rc != 0:
        err = mesh.error.decode(errors="replace")
        raise FileNotFoundError(err or f"tpt_load_obj failed on {path}")
    try:
        nv, nt, nm = mesh.n_verts, mesh.n_tris, mesh.n_materials
        verts = np.ctypeslib.as_array(mesh.verts, (nv * 3,)).reshape(
            nv, 3).copy()
        idx = np.ctypeslib.as_array(mesh.indices, (nt * 3,)).reshape(
            nt, 3).copy()
        mat_ids = np.ctypeslib.as_array(mesh.mat_ids, (nt,)).copy()
        props = np.ctypeslib.as_array(mesh.mat_props, (nm * 10,)).reshape(
            nm, 10).copy()
        names_blob = ctypes.string_at(mesh.mat_names, mesh.mat_names_len)
        names = names_blob.decode(errors="replace").split("\0")[:nm]
    finally:
        lib.tpt_free_mesh(ctypes.byref(mesh))

    materials = []
    for i in range(nm):
        materials.append(dict(
            name=names[i],
            diffuse=tuple(float(x) for x in props[i, 0:3]),
            emission=tuple(float(x) for x in props[i, 3:6]),
            ior=float(props[i, 6]),
            roughness=float(props[i, 7]),
            metallic=float(props[i, 8]),
        ))
    return verts, idx.astype(np.int64), mat_ids.astype(np.int64), materials


def unfilter_png_native(raw: bytes, h: int, stride: int,
                        channels: int) -> np.ndarray:
    """Unfilter PNG scanlines natively. Returns uint8 [h, stride] or raises."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    src = np.frombuffer(raw, np.uint8, h * (stride + 1))
    out = np.empty((h, stride), np.uint8)
    rc = lib.tpt_unfilter_png(h, stride, channels,
                              np.ascontiguousarray(src), out.reshape(-1))
    if rc != 0:
        raise ValueError("bad PNG filter byte")
    return out


def build_lbvh_native(tri_min: np.ndarray, tri_max: np.ndarray,
                      valid: np.ndarray):
    """Host-side LBVH build. Returns (left, skip, tri, bbox_min, bbox_max)
    with the flattened layout of ``tpu_pt.intersect.lbvh``."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = tri_min.shape[0]
    m = 2 * n - 1
    left = np.empty(m, np.int32)
    skip = np.empty(m, np.int32)
    tri = np.empty(m, np.int32)
    bmin = np.empty((m, 3), np.float32)
    bmax = np.empty((m, 3), np.float32)
    rc = lib.tpt_build_lbvh(
        n, np.ascontiguousarray(tri_min, np.float32),
        np.ascontiguousarray(tri_max, np.float32),
        np.ascontiguousarray(valid, np.uint8),
        left, skip, tri, bmin.reshape(-1), bmax.reshape(-1))
    if rc != 0:
        raise RuntimeError("tpt_build_lbvh failed")
    return left, skip, tri, bmin, bmax
