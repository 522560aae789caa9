"""Faithful reimplementations of the two batchgenerators.augmentations.utils
functions the reference imports (pad_nd_image for sliding-window padding,
resize_segmentation for seg resampling). Semantics match the public
batchgenerators implementation (MIC-DKFZ/batchgenerators)."""
import numpy as np


def pad_nd_image(image, new_shape=None, mode="constant", kwargs=None,
                 return_slicer=False, shape_must_be_divisible_by=None):
    if kwargs is None:
        kwargs = {"constant_values": 0}

    if new_shape is not None:
        old_shape = np.array(image.shape[-len(new_shape):])
    else:
        assert shape_must_be_divisible_by is not None
        assert isinstance(shape_must_be_divisible_by, (list, tuple, np.ndarray))
        new_shape = image.shape[-len(shape_must_be_divisible_by):]
        old_shape = new_shape

    num_axes_nopad = len(image.shape) - len(new_shape)
    new_shape = [max(new_shape[i], old_shape[i]) for i in range(len(new_shape))]

    if shape_must_be_divisible_by is not None:
        if not isinstance(shape_must_be_divisible_by, (list, tuple, np.ndarray)):
            shape_must_be_divisible_by = [shape_must_be_divisible_by] * len(new_shape)
        else:
            assert len(shape_must_be_divisible_by) == len(new_shape)
        for i in range(len(new_shape)):
            if new_shape[i] % shape_must_be_divisible_by[i] == 0:
                new_shape[i] -= shape_must_be_divisible_by[i]
        new_shape = np.array(
            [new_shape[i] + shape_must_be_divisible_by[i]
             - new_shape[i] % shape_must_be_divisible_by[i]
             for i in range(len(new_shape))])

    difference = np.array(new_shape) - old_shape
    pad_below = difference // 2
    pad_above = difference // 2 + difference % 2
    pad_list = ([[0, 0]] * num_axes_nopad
                + list([list(i) for i in zip(pad_below, pad_above)]))

    if not all(np.asarray(pad_list).flatten() == 0):
        res = np.pad(image, pad_list, mode, **kwargs)
    else:
        res = image

    if not return_slicer:
        return res
    pad_list = np.array(pad_list)
    pad_list[:, 1] = np.array(res.shape) - pad_list[:, 1]
    slicer = list(slice(*i) for i in pad_list)  # list: callers concatenate
    return res, slicer


def resize_segmentation(segmentation, new_shape, order=3):
    """One-hot-per-label spline resize (>=0.5 threshold) so interpolation never
    invents intermediate label values; order 0 is plain nearest."""
    from scipy.ndimage import zoom

    tpe = segmentation.dtype
    unique_labels = np.unique(segmentation)
    assert len(segmentation.shape) == len(new_shape), \
        "new shape must have same dimensionality as segmentation"

    def _resize(arr, order):
        # skimage.transform.resize(mode='edge', clip=True, anti_aliasing=False)
        # equivalent via scipy zoom with matching edge handling
        factors = [n / o for n, o in zip(new_shape, arr.shape)]
        return zoom(arr.astype(float), factors, order=order, mode="nearest",
                    grid_mode=True)

    if order == 0:
        return _resize(segmentation, 0).astype(tpe)
    reshaped = np.zeros(new_shape, dtype=tpe)
    for c in unique_labels:
        mask = segmentation == c
        reshaped_multihot = _resize(mask, order)
        reshaped[reshaped_multihot >= 0.5] = c
    return reshaped
