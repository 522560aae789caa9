"""Golden-value tests for the scipy-EDT surface metrics (evaluation/metrics.py
:210-277). medpy (the reference's backend, nnunet/evaluation/metrics.py:314-385)
is not installed here, so instead of a library cross-check these pin
hand-computed values on analytically tractable mask pairs — including the
medpy semantics subtleties: surface = mask minus its 1-connectivity erosion
(border_value=0), distances measured to the reference SURFACE (not the mask),
anisotropic voxel spacing applied in the EDT.
"""
import numpy as np

from multitalent_tpu.evaluation.metrics import (avg_surface_distance,
                                                avg_surface_distance_symmetric,
                                                dice, hausdorff_distance,
                                                hausdorff_distance_95)


def _vol(coords, shape=(7, 7, 7)):
    m = np.zeros(shape, bool)
    for c in coords:
        m[c] = True
    return m


def test_identical_masks_zero_distance():
    m = np.zeros((6, 6, 6), bool)
    m[2:5, 2:5, 2:5] = True
    assert hausdorff_distance(m, m) == 0.0
    assert hausdorff_distance_95(m, m) == 0.0
    assert avg_surface_distance_symmetric(m, m) == 0.0
    assert dice(m, m) == 1.0


def test_single_voxels_with_anisotropic_spacing():
    """Two single-voxel masks 3 voxels apart along z with spacing 2mm/voxel:
    every surface distance is exactly 6mm."""
    t = _vol([(0, 0, 0)])
    r = _vol([(3, 0, 0)])
    sp = (2.0, 1.0, 1.0)
    assert hausdorff_distance(t, r, voxel_spacing=sp) == 6.0
    assert hausdorff_distance_95(t, r, voxel_spacing=sp) == 6.0
    assert avg_surface_distance(t, r, voxel_spacing=sp) == 6.0
    assert avg_surface_distance_symmetric(t, r, voxel_spacing=sp) == 6.0


def test_nested_segments_asymmetric_distances():
    """test = 3-voxel row strictly inside ref = 5-voxel row (1-thick shapes are
    entirely surface under the erosion rule):
      test->ref distances: (0,0,0)          -> ASD = 0, HD1 = 0
      ref->test distances: (1,0,0,0,1)      -> HD2 = 1
      ASSD = (0+0+0+1+0+0+0+1)/8 = 0.25
    """
    t = _vol([(0, 0, 2), (0, 0, 3), (0, 0, 4)])
    r = _vol([(0, 0, 1), (0, 0, 2), (0, 0, 3), (0, 0, 4), (0, 0, 5)])
    assert avg_surface_distance(t, r) == 0.0
    assert hausdorff_distance(t, r) == 1.0
    np.testing.assert_allclose(avg_surface_distance_symmetric(t, r), 0.25)
    # asymmetric ASD reverses: every ref-surface voxel is <=1 from test
    np.testing.assert_allclose(avg_surface_distance(r, t), 2.0 / 5.0)


def test_hd95_percentile_semantics():
    """One outlier voxel far away: HD is the outlier, HD95 the percentile.
    test = 20-voxel row + 1 voxel 10 off; ref = the same row."""
    row = [(0, 0, i) for i in range(20)]
    t = _vol(row + [(0, 0, 30)], shape=(1, 1, 40))
    r = _vol(row, shape=(1, 1, 40))
    assert hausdorff_distance(t, r) == 11.0  # outlier to row end at 19
    d_sorted = np.array([0.0] * 20 + [11.0])
    expected = max(np.percentile(d_sorted, 95), 0.0)
    np.testing.assert_allclose(hausdorff_distance_95(t, r), expected)


def test_interior_voxels_do_not_count():
    """Surface extraction must drop interior voxels: a 5^3 cube vs the same
    cube dilated by 1 in +z only. The max distance from the ref's far face to
    the test surface is 1 (not the cube diagonal)."""
    t = np.zeros((9, 9, 9), bool)
    t[2:7, 2:7, 2:7] = True
    r = t.copy()
    r[7, 2:7, 2:7] = True  # one extra slab
    assert hausdorff_distance(t, r) == 1.0
    assert avg_surface_distance(t, r) <= 1.0
