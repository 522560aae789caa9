"""Huge-page-backed numpy allocation for large host buffers.

On the nested-virtualised hosts this framework targets, a minor page fault
costs ~60-100 us (hypervisor EPT round-trip), so first-touching a fresh
multi-GB numpy allocation dominates host-side time: measured 97 s to touch a
1.2 GB np.empty vs 1.8 s for the same buffer backed by transparent huge pages
(madvise(MADV_HUGEPAGE) issued before first touch cuts the fault count 512x).
Use fast_empty for any large buffer that is written once and consumed --
decompressed segmentation masks, fetched device results, resampled volumes.

Small allocations go straight to np.empty: the mmap + madvise syscalls cost
more than the faults they save below a few MB.
"""
from __future__ import annotations

import ctypes
import mmap
import sys

import numpy as np

_MADV_HUGEPAGE = 14
_THRESHOLD_BYTES = 16 << 20

_libc = None
_libc_tried = False


def _get_libc():
    global _libc, _libc_tried
    if _libc_tried:
        return _libc
    _libc_tried = True
    if not sys.platform.startswith("linux"):
        return None
    try:
        _libc = ctypes.CDLL("libc.so.6", use_errno=True)
    except OSError:
        _libc = None
    return _libc


def fast_empty(shape, dtype=np.float32) -> np.ndarray:
    """np.empty whose backing pages are madvised to 2 MiB huge pages before
    first touch. Falls back to plain np.empty off-Linux, for small buffers,
    or when madvise is unavailable. Contents are uninitialised (zero-fill
    pages on first touch, like any fresh mmap)."""
    dtype = np.dtype(dtype)
    shape = tuple(int(s) for s in (shape if np.iterable(shape) else (shape,)))
    nbytes = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
    libc = _get_libc()
    if libc is None or nbytes < _THRESHOLD_BYTES:
        return np.empty(shape, dtype)
    try:
        buf = mmap.mmap(-1, nbytes)
    except (OSError, ValueError, OverflowError):
        return np.empty(shape, dtype)
    addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
    libc.madvise(ctypes.c_void_p(addr), ctypes.c_size_t(nbytes),
                 _MADV_HUGEPAGE)  # advisory: ignore the return code
    # np.frombuffer keeps `buf` alive through arr.base
    return np.frombuffer(buf, dtype).reshape(shape)


def fast_zeros(shape, dtype=np.float32) -> np.ndarray:
    """Zero-initialised fast_empty. Fresh anonymous mmap pages are already
    zero, so no memset is needed on the huge-page path."""
    dtype = np.dtype(dtype)
    shape = tuple(int(s) for s in (shape if np.iterable(shape) else (shape,)))
    nbytes = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
    if _get_libc() is None or nbytes < _THRESHOLD_BYTES:
        return np.zeros(shape, dtype)
    out = fast_empty(shape, dtype)
    if out.base is None:  # fast_empty fell back to np.empty: not zeroed
        out[...] = 0
    return out
