"""Generate reference-anchored golden fixtures for the resampling core.

Transcribes the reference algorithm LITERALLY (per-slice loops, per-slice
dtype casts, per-slice clip), from:
  /root/reference/nnunet/preprocessing/preprocessing.py:38-197
    (resample_patient / resample_data_or_seg)
  skimage.transform.resize semantics (the 'blatantly copied from sklearn'
    coordinate map the reference itself documents at preprocessing.py:156-163):
    output i samples input (i+0.5)*old/new-0.5, spline-prefiltered
    map_coordinates, mode 'edge'->'nearest', clip to the INPUT's range,
    anti_aliasing=False
  batchgenerators.augmentations.utils.resize_segmentation (per-label one-hot
    resize, threshold 0.5)
  preprocessing.py:200-321 (GenericPreprocessor.resample_and_normalize CT
    branch + crop_to_nonzero from cropping.py:23-116)

skimage itself is not installed in this environment; this transcription stands
in for it, built ONLY on scipy (which skimage wraps for these code paths).
Writes tests/fixtures/resample_golden.npz and prints a comparison against the
production implementation (multitalent_tpu/preprocessing/resampling.py).

Run: python scripts/gen_resample_golden.py
"""
import os
import sys

import numpy as np
from scipy import ndimage
from scipy.ndimage import binary_fill_holes, map_coordinates

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEP_Z_THRESHOLD = 3  # configuration.py:4 (both repos)


# ---- skimage.transform.resize transcription (order>0 and order 0) ----------

def skimage_resize(image, new_shape, order):
    """resize(image, new_shape, order=order, mode='edge', clip=True,
    anti_aliasing=False) for float images of any rank."""
    image = np.asarray(image, dtype=float)
    old_shape = image.shape
    if tuple(old_shape) == tuple(int(s) for s in new_shape):
        return image.copy()
    grids = np.meshgrid(*[np.arange(int(s), dtype=float) for s in new_shape],
                        indexing="ij")
    coords = [
        (g + 0.5) * (old / float(new)) - 0.5
        for g, old, new in zip(grids, old_shape, new_shape)
    ]
    out = map_coordinates(image, np.array(coords), order=order,
                          mode="nearest")
    # skimage clip=True: clip to the INPUT's own range
    return np.clip(out, image.min(), image.max())


def resize_segmentation_bg(segmentation, new_shape, order):
    """batchgenerators.resize_segmentation: order 0 -> plain nearest resize;
    else per-label indicator resize thresholded at 0.5."""
    tpe = segmentation.dtype
    if order == 0:
        return skimage_resize(segmentation.astype(float), new_shape,
                              order).astype(tpe)
    unique_labels = np.unique(segmentation)
    reshaped = np.zeros(tuple(int(s) for s in new_shape), dtype=tpe)
    for c in unique_labels:
        mask = segmentation == c
        reshaped_multihot = skimage_resize(mask.astype(float), new_shape,
                                           order)
        reshaped[reshaped_multihot >= 0.5] = c
    return reshaped


# ---- resample_data_or_seg transcription (preprocessing.py:109-197) ---------

def ref_resample_data_or_seg(data, new_shape, is_seg, axis=None, order=3,
                             do_separate_z=False, order_z=0):
    assert len(data.shape) == 4
    if is_seg:
        resize_fn = resize_segmentation_bg
    else:
        resize_fn = skimage_resize
    dtype_data = data.dtype
    shape = np.array(data[0].shape)
    new_shape = np.array(new_shape)
    if not np.any(shape != new_shape):
        return data
    data = data.astype(float)
    if do_separate_z:
        assert len(axis) == 1
        ax = axis[0]
        if ax == 0:
            new_shape_2d = new_shape[1:]
        elif ax == 1:
            new_shape_2d = new_shape[[0, 2]]
        else:
            new_shape_2d = new_shape[:-1]
        reshaped_final_data = []
        for c in range(data.shape[0]):
            reshaped_data = []
            for slice_id in range(shape[ax]):
                if ax == 0:
                    sl = data[c, slice_id]
                elif ax == 1:
                    sl = data[c, :, slice_id]
                else:
                    sl = data[c, :, :, slice_id]
                reshaped_data.append(
                    resize_fn(sl, new_shape_2d, order).astype(dtype_data))
            reshaped_data = np.stack(reshaped_data, ax)
            if shape[ax] != new_shape[ax]:
                rows, cols, dim = new_shape
                orig_rows, orig_cols, orig_dim = reshaped_data.shape
                row_scale = float(orig_rows) / rows
                col_scale = float(orig_cols) / cols
                dim_scale = float(orig_dim) / dim
                map_rows, map_cols, map_dims = np.mgrid[:rows, :cols, :dim]
                map_rows = row_scale * (map_rows + 0.5) - 0.5
                map_cols = col_scale * (map_cols + 0.5) - 0.5
                map_dims = dim_scale * (map_dims + 0.5) - 0.5
                coord_map = np.array([map_rows, map_cols, map_dims])
                if not is_seg or order_z == 0:
                    reshaped_final_data.append(
                        map_coordinates(reshaped_data, coord_map,
                                        order=order_z, mode="nearest"
                                        )[None].astype(dtype_data))
                else:
                    unique_labels = np.unique(reshaped_data)
                    reshaped = np.zeros(new_shape, dtype=dtype_data)
                    for cl in unique_labels:
                        reshaped_multihot = np.round(map_coordinates(
                            (reshaped_data == cl).astype(float), coord_map,
                            order=order_z, mode="nearest"))
                        reshaped[reshaped_multihot > 0.5] = cl
                    reshaped_final_data.append(
                        reshaped[None].astype(dtype_data))
            else:
                reshaped_final_data.append(
                    reshaped_data[None].astype(dtype_data))
        reshaped_final_data = np.vstack(reshaped_final_data)
    else:
        reshaped = []
        for c in range(data.shape[0]):
            reshaped.append(
                resize_fn(data[c], new_shape, order)[None].astype(dtype_data))
        reshaped_final_data = np.vstack(reshaped)
    return reshaped_final_data.astype(dtype_data)


# ---- resample_patient transcription (preprocessing.py:38-106) ---------------

def _get_do_separate_z(spacing, threshold=SEP_Z_THRESHOLD):
    return (np.max(spacing) / np.min(spacing)) > threshold


def _get_lowres_axis(spacing):
    return np.where(max(spacing) / np.array(spacing) == 1)[0]


def ref_resample_patient(data, seg, original_spacing, target_spacing,
                         order_data=3, order_seg=0, force_separate_z=False,
                         order_z_data=0, order_z_seg=0,
                         threshold=SEP_Z_THRESHOLD):
    shape = np.array(data[0].shape if data is not None else seg[0].shape)
    new_shape = np.round((np.array(original_spacing, float)
                          / np.array(target_spacing, float)
                          * shape)).astype(int)
    if force_separate_z is not None:
        do_separate_z = force_separate_z
        axis = _get_lowres_axis(original_spacing) if force_separate_z else None
    else:
        if _get_do_separate_z(original_spacing, threshold):
            do_separate_z = True
            axis = _get_lowres_axis(original_spacing)
        elif _get_do_separate_z(target_spacing, threshold):
            do_separate_z = True
            axis = _get_lowres_axis(target_spacing)
        else:
            do_separate_z = False
            axis = None
    if axis is not None and len(axis) != 1:
        do_separate_z = False
    data_out = (ref_resample_data_or_seg(data, new_shape, False, axis,
                                         order_data, do_separate_z,
                                         order_z=order_z_data)
                if data is not None else None)
    seg_out = (ref_resample_data_or_seg(seg, new_shape, True, axis,
                                        order_seg, do_separate_z,
                                        order_z=order_z_seg)
               if seg is not None else None)
    return data_out, seg_out


# ---- crop + resample_and_normalize + preprocess_test_case -------------------

def ref_crop_to_nonzero(data, seg, nonzero_label=-1):
    nonzero_mask = np.zeros(data.shape[1:], dtype=bool)
    for c in range(data.shape[0]):
        nonzero_mask |= data[c] != 0
    nonzero_mask = binary_fill_holes(nonzero_mask)
    coords = np.where(nonzero_mask)
    bbox = [[int(c.min()), int(c.max()) + 1] for c in coords]
    sl = tuple(slice(b[0], b[1]) for b in bbox)
    data = np.stack([data[c][sl] for c in range(data.shape[0])])
    seg = np.stack([seg[c][sl] for c in range(seg.shape[0])])
    mask_c = nonzero_mask[sl][None]
    seg[(seg == 0) & (mask_c == 0)] = nonzero_label
    return data, seg, bbox


def ref_preprocess_test_case(data, seg, original_spacing, target_spacing,
                             intensityproperties, force_separate_z=None):
    """CT, transpose_forward (0,1,2), use_nonzero_mask False — the MultiTalent
    configuration (MultiTalent_bs4 plans)."""
    data, seg, bbox = ref_crop_to_nonzero(data.astype(np.float32),
                                          seg.astype(np.float32))
    data = data.astype(np.float32)
    data[np.isnan(data)] = 0
    data, seg = ref_resample_patient(data, seg, original_spacing,
                                     target_spacing, order_data=3,
                                     order_seg=1,
                                     force_separate_z=force_separate_z,
                                     order_z_data=0, order_z_seg=0)
    seg[seg < -1] = 0
    ip = intensityproperties
    data[0] = np.clip(data[0], ip["percentile_00_5"], ip["percentile_99_5"])
    data[0] = (data[0] - ip["mean"]) / ip["sd"]
    return data.astype(np.float32), seg, bbox


# ---- case construction -------------------------------------------------------

def make_inputs():
    rs = np.random.RandomState(42)

    def smooth(shape, ch=1):
        out = []
        for _ in range(ch):
            v = rs.randn(*shape)
            out.append(ndimage.gaussian_filter(v, 1.5) * 3
                       + rs.randn(*shape) * 0.1)
        return np.stack(out).astype(np.float32)

    def labels(shape):
        seg = np.zeros(shape, np.float32)
        zz, yy, xx = np.ogrid[:shape[0], :shape[1], :shape[2]]
        seg[((zz - 4) ** 2 + (yy - 5) ** 2 + (xx - 5) ** 2) <= 9] = 1
        seg[((zz - 6) ** 2 + (yy - 8) ** 2 + (xx - 7) ** 2) <= 4] = 2
        return seg[None]

    cases = {}
    cases["iso"] = dict(
        data=smooth((9, 11, 10), 2), seg=labels((9, 11, 10)),
        original_spacing=(1.2, 1.0, 0.9), target_spacing=(1.0, 1.0, 1.0),
        order_data=3, order_seg=1, force_separate_z=None,
        order_z_data=0, order_z_seg=0)
    cases["sepz_down"] = dict(
        data=smooth((12, 13, 11)), seg=labels((12, 13, 11)),
        original_spacing=(4.0, 1.0, 1.0), target_spacing=(2.0, 1.0, 1.0),
        order_data=3, order_seg=1, force_separate_z=None,
        order_z_data=0, order_z_seg=0)
    cases["sepz_up"] = dict(
        data=smooth((7, 12, 12)), seg=labels((7, 12, 12)),
        original_spacing=(3.5, 1.0, 1.0), target_spacing=(1.75, 0.8, 0.8),
        order_data=3, order_seg=1, force_separate_z=None,
        order_z_data=0, order_z_seg=0)
    cases["sepz_axis2"] = dict(
        data=smooth((10, 11, 12)), seg=labels((10, 11, 12)),
        original_spacing=(1.0, 1.0, 4.0), target_spacing=(1.0, 1.0, 2.0),
        order_data=3, order_seg=1, force_separate_z=None,
        order_z_data=0, order_z_seg=0)
    cases["sepz_zorder1"] = dict(
        data=smooth((12, 10, 10)), seg=labels((12, 10, 10)),
        original_spacing=(4.0, 1.0, 1.0), target_spacing=(2.0, 1.0, 1.0),
        order_data=3, order_seg=1, force_separate_z=True,
        order_z_data=1, order_z_seg=1)
    return cases


def main():
    out = {}
    cases = make_inputs()
    for name, c in cases.items():
        d, s = ref_resample_patient(
            c["data"], c["seg"], c["original_spacing"], c["target_spacing"],
            order_data=c["order_data"], order_seg=c["order_seg"],
            force_separate_z=c["force_separate_z"],
            order_z_data=c["order_z_data"], order_z_seg=c["order_z_seg"])
        out[f"{name}__in_data"] = c["data"]
        out[f"{name}__in_seg"] = c["seg"]
        out[f"{name}__meta"] = np.array(
            [*c["original_spacing"], *c["target_spacing"],
             c["order_data"], c["order_seg"],
             -1 if c["force_separate_z"] is None else int(c["force_separate_z"]),
             c["order_z_data"], c["order_z_seg"]], np.float64)
        out[f"{name}__out_data"] = d
        out[f"{name}__out_seg"] = s

    # full preprocess_test_case golden (crop -> resample -> CT normalize)
    rs = np.random.RandomState(7)
    raw = np.zeros((1, 14, 16, 15), np.float32)
    inner = ndimage.gaussian_filter(rs.randn(9, 11, 10), 1.2) * 50 + 40
    raw[0, 3:12, 2:13, 3:13] = inner.astype(np.float32)
    rawseg = np.zeros((1, 14, 16, 15), np.float32)
    rawseg[0, 5:9, 5:9, 6:10] = 1
    ip = dict(percentile_00_5=-30.0, percentile_99_5=150.0, mean=40.0, sd=30.0)
    d, s, bbox = ref_preprocess_test_case(
        raw, rawseg, (3.5, 1.0, 1.0), (1.75, 1.0, 1.0), ip)
    out["tc__in_data"] = raw
    out["tc__in_seg"] = rawseg
    out["tc__out_data"] = d
    out["tc__out_seg"] = s
    out["tc__bbox"] = np.array(bbox)

    fixdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures")
    os.makedirs(fixdir, exist_ok=True)
    path = os.path.join(fixdir, "resample_golden.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path)/1024:.0f} KiB)")

    # immediate comparison against the production implementation
    from multitalent_tpu.preprocessing.resampling import resample_patient
    for name, c in cases.items():
        d, s = resample_patient(
            c["data"], c["seg"], c["original_spacing"], c["target_spacing"],
            order_data=c["order_data"], order_seg=c["order_seg"],
            force_separate_z=c["force_separate_z"],
            order_z_data=c["order_z_data"], order_z_seg=c["order_z_seg"])
        gd, gs = out[f"{name}__out_data"], out[f"{name}__out_seg"]
        dd = np.abs(d - gd).max() / (np.abs(gd).max() + 1e-8)
        sm = float((s != gs).mean())
        print(f"{name:14s} data rel max diff {dd:.2e}  seg mismatch {sm:.4%}")


if __name__ == "__main__":
    main()
