"""On-device export (ops/device_export.py): resample+reduce on device must match
the host export path (segmentation_export.py analog) wherever it is enabled."""
import jax.numpy as jnp
import numpy as np
import pytest

from multitalent_tpu.inference.segmentation_export import (
    resample_probabilities_to_cropped_grid, segmentation_from_probs)
from multitalent_tpu.ops.device_export import (can_export_on_device,
                                               device_resample_argmax,
                                               device_resample_threshold_packed,
                                               segmentation_from_regions_packed)

rng = np.random.RandomState(11)


def _props(shape_after_crop, spacing=(1.0, 1.0, 1.0)):
    return {"size_after_cropping": np.array(shape_after_crop),
            "original_spacing": np.array(spacing),
            "spacing_after_resampling": np.array((1.0, 1.0, 1.0))}


def test_can_export_on_device_gates_separate_z():
    assert can_export_on_device(_props((8, 9, 10)))
    # anisotropy beyond the threshold (ratio > 3) -> host path
    assert not can_export_on_device(_props((8, 9, 10), spacing=(5.0, 1.0, 1.0)))
    assert can_export_on_device(_props((8, 9, 10), spacing=(5.0, 1.0, 1.0)),
                                force_separate_z=False)


@pytest.mark.parametrize("k", [3, 5])
def test_device_argmax_matches_host_export(k):
    probs = rng.rand(6, 7, 8, k).astype(np.float32)
    out_shape = (9, 11, 13)
    host = resample_probabilities_to_cropped_grid(
        np.moveaxis(probs, -1, 0), _props(out_shape), order=1)
    host_seg = host.argmax(0)
    dev_seg = np.asarray(device_resample_argmax(jnp.asarray(probs), out_shape,
                                                chunk_channels=2))
    # linear resampling numerics differ at ~1e-7; only near-tie voxels may flip
    mismatch = np.mean(dev_seg != host_seg)
    assert mismatch < 0.01, mismatch


def test_device_threshold_packed_matches_host_export():
    k = 37  # spans two uint32 words with a ragged tail
    probs = rng.rand(6, 7, 8, k).astype(np.float32)
    out_shape = (9, 10, 12)
    host = resample_probabilities_to_cropped_grid(
        np.moveaxis(probs, -1, 0), _props(out_shape), order=1)
    host_bits = host > 0.5
    packed = np.asarray(device_resample_threshold_packed(
        jnp.asarray(probs), out_shape, threshold=0.5, chunk_channels=4))
    assert packed.shape == (*out_shape, 2)
    dev_bits = np.stack([((packed[..., i // 32] >> np.uint32(i % 32)) & 1)
                         .astype(bool) for i in range(k)])
    mismatch = np.mean(dev_bits != host_bits)
    assert mismatch < 0.01, mismatch
    # labelmap assembly in region_class_order
    order = list(range(1, k + 1))
    seg = segmentation_from_regions_packed(packed, order)
    host_seg = segmentation_from_probs(host, order)
    assert np.mean(seg != host_seg) < 0.02


def test_device_threshold_bits_matches_packed():
    """Class-major bits export (the bit-plane transport's producer) must
    agree exactly with the word-packed export and drive the same labelmap."""
    from multitalent_tpu.ops.device_export import (
        device_resample_threshold_bits, segmentation_from_regions_bits)
    k = 37
    probs = rng.rand(6, 7, 8, k).astype(np.float32)
    out_shape = (9, 10, 12)
    packed = np.asarray(device_resample_threshold_packed(
        jnp.asarray(probs), out_shape, threshold=0.5, chunk_channels=4))
    word_bits = np.stack([((packed[..., i // 32] >> np.uint32(i % 32)) & 1)
                          .astype(bool) for i in range(k)])
    bits = np.asarray(device_resample_threshold_bits(
        jnp.asarray(probs), out_shape, threshold=0.5, chunk_channels=4))
    assert bits.shape == (k, *out_shape)
    np.testing.assert_array_equal(bits.astype(bool), word_bits)
    order = list(range(1, k + 1))
    np.testing.assert_array_equal(
        segmentation_from_regions_bits(bits.astype(bool), order),
        segmentation_from_regions_packed(packed, order))


def test_downscaling_resample_matches_host_no_antialias():
    """Inverse resample where the original grid is COARSER than the plans'
    target spacing (downscaling on every axis). jax.image.resize's default
    antialias=True diverges from the host skimage-order-1 semantics here
    (max|diff| ~0.2); with antialias=False they agree to float tolerance."""
    from multitalent_tpu.ops.device_export import _resize_chunk_fn

    k = 4
    probs = rng.rand(12, 14, 16, k).astype(np.float32)
    out_shape = (7, 6, 9)
    host = resample_probabilities_to_cropped_grid(
        np.moveaxis(probs, -1, 0), _props(out_shape), order=1)
    dev = np.asarray(_resize_chunk_fn(probs.shape[:-1], out_shape, k)(
        jnp.asarray(probs), np.int32(0)))
    np.testing.assert_allclose(np.moveaxis(dev, -1, 0), host, atol=2e-5)
    # and the argmax built on it matches the host export
    host_seg = host.argmax(0)
    dev_seg = np.asarray(device_resample_argmax(jnp.asarray(probs), out_shape,
                                                chunk_channels=2))
    assert np.mean(dev_seg != host_seg) < 0.01


def test_argmax_then_nearest_resample_fastest_path():
    """predict_cases_fastest semantics: argmax at network grid, nearest
    labelmap resample. Must equal host nearest-resampling of the argmax."""
    from multitalent_tpu.ops.device_export import device_argmax_resample_nearest

    probs = rng.rand(6, 8, 10, 4).astype(np.float32)
    out_shape = (9, 12, 15)
    dev = np.asarray(device_argmax_resample_nearest(jnp.asarray(probs), out_shape))
    host_seg = probs.argmax(-1)
    # nearest by index mapping (jax.image.resize "nearest" semantics)
    idx = [np.minimum((np.arange(o) + 0.5) * i / o, i - 1).astype(int)
           for i, o in zip(probs.shape[:-1], out_shape)]
    ref = host_seg[np.ix_(*idx)]
    np.testing.assert_array_equal(dev, ref)


def test_identity_shape_resample_is_exact():
    probs = rng.rand(5, 6, 7, 4).astype(np.float32)
    seg = np.asarray(device_resample_argmax(jnp.asarray(probs), (5, 6, 7)))
    np.testing.assert_array_equal(seg, probs.argmax(-1))
