"""ctypes bindings for the optional C++ host-path library (native/)."""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        so = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            "native",
            "libarctic_native.so",
        )
        if os.path.exists(so):
            _LIB = ctypes.CDLL(so)
            _LIB.arctic_load_hdr.restype = ctypes.c_int
            _LIB.arctic_load_hdr.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ]
            _LIB.arctic_free.argtypes = [ctypes.c_void_p]
            _LIB.arctic_compute_tangents.restype = ctypes.c_int
            _LIB.arctic_compute_tangents.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # positions
                ctypes.POINTER(ctypes.c_float),  # normals
                ctypes.POINTER(ctypes.c_float),  # uvs
                ctypes.c_int,  # n verts
                ctypes.POINTER(ctypes.c_int),  # indices
                ctypes.c_int,  # n tris
                ctypes.POINTER(ctypes.c_float),  # out tangents
                ctypes.POINTER(ctypes.c_float),  # out bitangents
            ]
    return _LIB


def available() -> bool:
    return _lib() is not None


def load_hdr(path: str) -> np.ndarray:
    lib = _lib()
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = ctypes.POINTER(ctypes.c_float)()
    rc = lib.arctic_load_hdr(path.encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(ptr))
    if rc != 0:
        raise IOError(f"arctic_load_hdr failed ({rc}) for {path}")
    try:
        n = w.value * h.value * 3
        arr = np.ctypeslib.as_array(ptr, shape=(n,)).reshape(h.value, w.value, 3).copy()
    finally:
        lib.arctic_free(ptr)
    return arr


def compute_tangents(positions, normals, uvs, indices):
    lib = _lib()
    positions = np.ascontiguousarray(positions, np.float32)
    normals = np.ascontiguousarray(normals, np.float32)
    uvs = np.ascontiguousarray(uvs, np.float32)
    indices = np.ascontiguousarray(indices, np.int32)
    n = len(positions)
    tan = np.zeros((n, 3), np.float32)
    btn = np.zeros((n, 3), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    rc = lib.arctic_compute_tangents(
        positions.ctypes.data_as(fp),
        normals.ctypes.data_as(fp),
        uvs.ctypes.data_as(fp),
        n,
        indices.ctypes.data_as(ip),
        len(indices),
        tan.ctypes.data_as(fp),
        btn.ctypes.data_as(fp),
    )
    if rc != 0:
        raise RuntimeError("arctic_compute_tangents failed")
    return tan, btn
