"""Native host kernels (C++ via ctypes) with transparent Python fallbacks.

Build happens lazily on first use (g++ -O3 -shared); if no toolchain is present
the scipy-based fallbacks are used and everything still works.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libmtt_native.so")
_LIB = None
_TRIED = False


def _build() -> bool:
    src = os.path.join(_HERE, "cc3d.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, src],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib():
    """ctypes handle to the native library, or None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.isfile(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.cc3d_label.restype = ctypes.c_int32
    lib.cc3d_label.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    lib.keep_largest_component.restype = ctypes.c_int64
    lib.keep_largest_component.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    _LIB = lib
    return _LIB


def label_3d(mask: np.ndarray):
    """6-connected 3D labeling: (labels int32, num_components). Native if
    available, else scipy.ndimage.label."""
    lib = get_lib()
    if lib is None or mask.ndim != 3:
        from scipy.ndimage import label as _label
        lab, n = _label(mask.astype(np.uint8))
        return lab.astype(np.int32), int(n)
    m = np.ascontiguousarray(mask.astype(np.uint8))
    out = np.empty(m.shape, np.int32)
    n = lib.cc3d_label(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        *[ctypes.c_int64(s) for s in m.shape])
    return out, int(n)


def keep_largest_component(mask: np.ndarray) -> np.ndarray:
    """Zero every connected component except the largest. Returns the new mask."""
    lib = get_lib()
    if lib is None or mask.ndim != 3:
        lab, n = label_3d(mask)
        if n <= 1:
            return mask.astype(bool)
        sizes = np.bincount(lab.ravel())[1:]
        return lab == (int(np.argmax(sizes)) + 1)
    m = np.ascontiguousarray(mask.astype(np.uint8))
    scratch = np.empty(m.shape, np.int32)
    lib.keep_largest_component(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        *[ctypes.c_int64(s) for s in m.shape])
    return m.astype(bool)
