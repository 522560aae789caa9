import numpy as np
import pytest

from multitalent_tpu.io.nifti import Geometry, read_nifti, write_nifti


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8])
def test_roundtrip_identity_geometry(tmp_path, suffix, dtype):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.floating):
        arr = rng.standard_normal((7, 9, 11)).astype(dtype)
    else:
        arr = rng.integers(0, 100, size=(7, 9, 11)).astype(dtype)
    p = tmp_path / f"img{suffix}"
    write_nifti(p, arr, Geometry(spacing=(1.5, 0.8, 2.0), origin=(-10.0, 4.0, 7.5)))
    back, geom = read_nifti(p)
    np.testing.assert_array_equal(back, arr)
    assert back.shape == arr.shape
    np.testing.assert_allclose(geom.spacing, (1.5, 0.8, 2.0), rtol=1e-6)
    np.testing.assert_allclose(geom.origin, (-10.0, 4.0, 7.5), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(geom.direction_matrix(), np.eye(3), atol=1e-6)


def test_roundtrip_nontrivial_direction(tmp_path):
    arr = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    # 90 degree rotation about z in LPS space
    direction = (0.0, -1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0)
    g = Geometry(spacing=(1.0, 2.0, 3.0), origin=(5.0, -6.0, 7.0), direction=direction)
    p = tmp_path / "img.nii.gz"
    write_nifti(p, arr, g)
    back, geom = read_nifti(p)
    np.testing.assert_array_equal(back, arr)
    np.testing.assert_allclose(geom.affine_lps(), g.affine_lps(), atol=1e-5)


def test_roundtrip_4d(tmp_path):
    arr = np.random.default_rng(1).standard_normal((3, 4, 5, 6)).astype(np.float32)
    p = tmp_path / "img4d.nii.gz"
    write_nifti(p, arr)
    back, _ = read_nifti(p)
    np.testing.assert_array_equal(back, arr)


def test_geometry_affine_roundtrip():
    g = Geometry(spacing=(0.7, 1.1, 3.0), origin=(1.0, 2.0, 3.0),
                 direction=(0, 0, 1, 1, 0, 0, 0, 1, 0))
    g2 = Geometry.from_affine_lps(g.affine_lps())
    np.testing.assert_allclose(g2.affine_lps(), g.affine_lps(), atol=1e-9)
