"""ctypes bindings to the native runtime library (native/src/*.cpp).

The native library provides production-speed host-side components
(rasterizer, marching tetrahedra) matching the pure-Python versions in
`mesh/`. It is built on first use with the repo Makefile; every entry point
falls back to the Python implementation when the toolchain or build is
unavailable, so nothing hard-depends on it.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libbundlesdf_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # no toolchain -> Python fallback
            logging.info(f"native build unavailable ({e}); using Python "
                         "fallbacks")
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logging.info(f"native load failed ({e}); using Python fallbacks")
        return None

    lib.rasterize_mesh.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float)]
    lib.marching_tet_run.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64)]
    lib.marching_tet_fetch.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def rasterize_native(vertices, faces, K, ob_in_cam, H, W, znear=0.001):
    """Native twin of mesh.render.rasterize; returns the same dict or None
    when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    vertices = np.ascontiguousarray(vertices, np.float64)
    faces = np.ascontiguousarray(faces, np.int64)
    K = np.ascontiguousarray(K, np.float64)
    T = np.ascontiguousarray(ob_in_cam, np.float64)
    depth = np.zeros((H, W), np.float32)
    face_id = np.full((H, W), -1, np.int32)
    bary = np.zeros((H, W, 3), np.float32)
    lib.rasterize_mesh(
        vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(vertices),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(faces),
        K.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        T.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        H, W, znear,
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        face_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bary.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return {"depth": depth, "face_id": face_id, "bary": bary}


def marching_tetrahedra_native(field, isolevel=0.0):
    """Native twin of mesh.marching.marching_tetrahedra (without the
    gradient-based winding fix — applied by the caller); returns
    (verts, faces) or None."""
    lib = _load()
    if lib is None:
        return None
    field = np.ascontiguousarray(field, np.float32)
    nx, ny, nz = field.shape
    nv = ctypes.c_int64(0)
    nf = ctypes.c_int64(0)
    lib.marching_tet_run(
        field.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, isolevel, ctypes.byref(nv), ctypes.byref(nf))
    verts = np.zeros((nv.value, 3), np.float64)
    faces = np.zeros((nf.value, 3), np.int64)
    if nv.value:
        lib.marching_tet_fetch(
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return verts, faces
