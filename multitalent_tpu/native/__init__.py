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
    src = os.path.join(_HERE, "cc3d.cpp")
    stale = (os.path.isfile(_SO) and os.path.isfile(src)
             and os.path.getmtime(src) > os.path.getmtime(_SO))
    if (not os.path.isfile(_SO) or stale) and not _build() and stale:
        pass  # stale-but-unbuildable: fall through to the vendored binary
    if not os.path.isfile(_SO):
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
    if hasattr(lib, "unpack_class_bits"):
        lib.unpack_class_bits.restype = None
        lib.unpack_class_bits.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    if hasattr(lib, "rle_expand_u32"):
        lib.rle_expand_u32.restype = None
        lib.rle_expand_u32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64]
    if hasattr(lib, "rle_expand_bits"):
        lib.rle_expand_bits.restype = None
        lib.rle_expand_bits.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint8, ctypes.POINTER(ctypes.c_uint8)]
    if hasattr(lib, "rle_fill_ones"):
        lib.rle_fill_ones.restype = None
        lib.rle_fill_ones.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint8, ctypes.POINTER(ctypes.c_uint8)]
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


def unpack_class_bits(packed_w: np.ndarray, num_classes: int):
    """Bit-packed per-voxel uint32 words (..., W) -> channel-major bool masks
    (num_classes, ...). Native single-pass expansion; returns None when the
    native library is unavailable (callers fall back to numpy)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "unpack_class_bits"):
        return None
    from multitalent_tpu.utils.alloc import fast_empty
    packed_w = np.ascontiguousarray(packed_w, np.uint32)
    spatial = packed_w.shape[:-1]
    n_vox = int(np.prod(spatial))
    # huge-page backing: first-touch faults on a fresh multi-GB np.empty cost
    # 20-100 s on this host class (utils/alloc.py)
    out = fast_empty((num_classes, n_vox), np.uint8)
    lib.unpack_class_bits(
        packed_w.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n_vox), ctypes.c_int64(packed_w.shape[-1]),
        ctypes.c_int64(num_classes))
    return out.view(np.bool_).reshape((num_classes,) + spatial)


def rle_expand_u32(starts: np.ndarray, vals: np.ndarray, n: int,
                   out_strided: np.ndarray) -> bool:
    """Expand runs (start indices int32, values uint32) into out_strided, a
    1-D uint32 view whose elements are `stride` apart (e.g. one bit-word
    plane of a (Z,Y,X,W) array). Returns False when the native library is
    unavailable (callers fall back to np.repeat)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "rle_expand_u32"):
        return False
    starts = np.ascontiguousarray(starts, np.int32)
    vals = np.ascontiguousarray(vals, np.uint32)
    stride_bytes, = out_strided.strides
    assert stride_bytes % 4 == 0 and out_strided.dtype == np.uint32
    lib.rle_expand_u32(
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(starts.shape[0]), ctypes.c_int64(n),
        out_strided.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(stride_bytes // 4))
    return True


def rle_fill_ones(starts: np.ndarray, n: int, first: int,
                  out_u8: np.ndarray) -> bool:
    """Write only the value-1 runs of an alternating binary RLE into a
    PRE-ZEROED uint8 array (np.zeros/calloc: pages untouched until a run
    lands on them — O(foreground) work instead of O(n)). Returns False when
    the native library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "rle_fill_ones"):
        return False
    starts = np.ascontiguousarray(starts, np.int32)
    assert out_u8.dtype == np.uint8 and out_u8.flags.c_contiguous
    lib.rle_fill_ones(
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(starts.shape[0]), ctypes.c_int64(n),
        ctypes.c_uint8(1 if first else 0),
        out_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return True


def rle_expand_bits(starts: np.ndarray, n: int, first: int,
                    out_u8: np.ndarray) -> bool:
    """Expand an alternating binary RLE (start indices only, run r carrying
    value first^(r&1)) into the contiguous uint8 array out_u8[:n]. Returns
    False when the native library is unavailable (callers fall back to
    numpy)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "rle_expand_bits"):
        return False
    starts = np.ascontiguousarray(starts, np.int32)
    assert out_u8.dtype == np.uint8 and out_u8.flags.c_contiguous
    lib.rle_expand_bits(
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(starts.shape[0]), ctypes.c_int64(n),
        ctypes.c_uint8(1 if first else 0),
        out_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return True


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
