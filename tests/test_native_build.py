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
