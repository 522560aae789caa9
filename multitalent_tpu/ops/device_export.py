"""On-device probability export: inverse-resample + argmax/threshold on the TPU.

The reference export path (segmentation_export.py:27-159) fetches the full
class-probability volume to the host, spline-resamples it back to the
pre-resampling grid with scipy, then argmaxes/thresholds. On a tunnelled TPU
whose device->host link moves ~10 MB/s, fetching a 47-channel fp16 probability
volume costs minutes per case while the reduction that follows discards 99% of
those bytes. This module performs the inverse resampling (trilinear, matching
the export default interpolation order 1 with half-pixel centers) and the
argmax / region-thresholding on device, so only the final segmentation (uint8
labels, or bit-packed region masks) crosses the link — a 25-200x smaller
transfer with the same result.

Applicability: the isotropic-ish path only (no separate-z resampling — the
anisotropic case uses nearest/linear along z on a different grid; callers fall
back to the host path there, see `can_export_on_device`). Channels are
processed in chunks through ONE compiled program (channel base is a traced
dynamic-slice index), so the fp32 resampling intermediates never exceed a
bounded working set.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from multitalent_tpu.preprocessing.resampling import (get_do_separate_z,
                                                      get_lowres_axis)


def can_export_on_device(properties: dict, force_separate_z=None) -> bool:
    """True when the inverse resampling for this case is the plain full-3D
    spline path (the decision logic of segmentation_export.py:84-110); the
    separate-z anisotropic path stays on host."""
    if force_separate_z is False:
        return True
    spacing_original = np.array(properties["original_spacing"])
    spacing_after = properties.get("spacing_after_resampling")
    if force_separate_z is None:
        if get_do_separate_z(spacing_original):
            return False
        if spacing_after is not None and get_do_separate_z(np.array(spacing_after)):
            return False
        return True
    # force_separate_z is True
    axis = get_lowres_axis(spacing_original)
    return axis is not None and len(axis) != 1  # degenerate -> full 3D path


@lru_cache(maxsize=64)
def _resize_chunk_fn(in_shape, out_shape, nchunk):
    """jitted: dynamic channel slice [base, base+nchunk) -> trilinear-resized
    fp32 chunk (one compiled program serves every chunk)."""

    @jax.jit
    def fn(probs, base):
        chunk = jax.lax.dynamic_slice_in_dim(probs, base, nchunk, axis=-1)
        # antialias=False: the host path this replaces (skimage order-1
        # semantics in resample_probabilities_to_cropped_grid) does not
        # anti-alias, and jax.image.resize's default antialias=True changes
        # the result whenever any axis downscales (original grid coarser than
        # the plans' target spacing) — measured max|diff| 0.21 vs 6e-8.
        return jax.image.resize(chunk.astype(jnp.float32),
                                (*out_shape, nchunk), method="linear",
                                antialias=False)
    return fn


@jax.jit
def _argmax_update(best_val, best_idx, resized, base):
    idx = jnp.argmax(resized, axis=-1).astype(jnp.int32)
    val = jnp.max(resized, axis=-1)
    take = val > best_val  # strict: earlier channels win ties (np.argmax parity)
    return (jnp.where(take, val, best_val),
            jnp.where(take, idx + base, best_idx))


@lru_cache(maxsize=8)
def _threshold_pack_fn(threshold: float):
    @jax.jit
    def fn(resized, shift0):
        """resized (Z,Y,X,c) -> per-voxel uint32 word with bits shifted by
        shift0 (= channel base within its 32-bit word)."""
        bits = resized > threshold
        shift = shift0.astype(jnp.uint32) + jnp.arange(bits.shape[-1],
                                                       dtype=jnp.uint32)
        return jnp.sum(bits.astype(jnp.uint32) << shift, axis=-1,
                       dtype=jnp.uint32)
    return fn


def device_resample_argmax(probs_dev, out_shape, chunk_channels: int = 8):
    """probs (Z, Y, X, K) on device -> argmax labels (Z', Y', X') int32 on
    device, resampled trilinearly channel-chunk by channel-chunk. K is padded
    with -inf channels internally so one chunk size serves the tail."""
    k = probs_dev.shape[-1]
    out_shape = tuple(int(s) for s in out_shape)
    c = min(chunk_channels, k)
    pad = (-k) % c
    if pad:
        # large-negative finite pad: -inf would turn the resize's zero-weight
        # taps into 0*inf = NaN
        probs_dev = jnp.pad(probs_dev, [(0, 0)] * (probs_dev.ndim - 1)
                            + [(0, pad)], constant_values=-60000.0)
    resize = _resize_chunk_fn(probs_dev.shape[:-1], out_shape, c)
    best_val = jnp.full(out_shape, -jnp.inf, jnp.float32)
    best_idx = jnp.zeros(out_shape, jnp.int32)
    for base in range(0, k + pad, c):
        rs = resize(probs_dev, np.int32(base))
        best_val, best_idx = _argmax_update(best_val, best_idx, rs,
                                            np.int32(base))
    return best_idx


@lru_cache(maxsize=64)
def _argmax_nearest_fn(in_shape, out_shape):
    @jax.jit
    def fn(probs):
        seg = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        return jax.image.resize(seg, out_shape, method="nearest")
    return fn


def device_argmax_resample_nearest(probs_dev, out_shape):
    """`predict_cases_fastest` semantics (reference predict.py:442-540): argmax
    at the NETWORK grid first, then nearest-resample the single int labelmap —
    resampling 1 channel instead of K makes this the cheapest export, at the
    cost of blockier boundaries than probability-space resampling."""
    out_shape = tuple(int(s) for s in out_shape)
    return _argmax_nearest_fn(probs_dev.shape[:-1], out_shape)(probs_dev)


def device_resample_threshold_packed(probs_dev, out_shape,
                                     threshold: float = 0.5,
                                     chunk_channels: int = 8):
    """probs (Z, Y, X, K) -> bit-packed thresholded masks
    (Z', Y', X', ceil(K/32)) uint32 on device. chunk_channels must divide 32."""
    assert 32 % chunk_channels == 0
    k = probs_dev.shape[-1]
    out_shape = tuple(int(s) for s in out_shape)
    c = min(chunk_channels, k)
    pad = (-k) % c
    if pad:  # padded channels threshold False for any threshold >= 0
        probs_dev = jnp.pad(probs_dev, [(0, 0)] * (probs_dev.ndim - 1)
                            + [(0, pad)], constant_values=-60000.0)
    resize = _resize_chunk_fn(probs_dev.shape[:-1], out_shape, c)
    pack = _threshold_pack_fn(float(threshold))
    nwords = (k + 31) // 32
    words = [jnp.zeros(out_shape, jnp.uint32) for _ in range(nwords)]
    for base in range(0, k + pad, c):
        rs = resize(probs_dev, np.int32(base))
        w = base // 32
        words[w] = words[w] | pack(rs, np.int32(base % 32))
    return jnp.stack(words, axis=-1)


@lru_cache(maxsize=8)
def _threshold_bits_fn(threshold: float):
    @jax.jit
    def fn(resized):
        """resized (Z,Y,X,c) -> class-major uint8 masks (c, Z, Y, X)."""
        return jnp.moveaxis(resized > threshold, -1, 0).astype(jnp.uint8)
    return fn


def device_resample_threshold_bits(probs_dev, out_shape,
                                   threshold: float = 0.5,
                                   chunk_channels: int = 8):
    """probs (Z, Y, X, K) -> CLASS-MAJOR thresholded uint8 masks
    (K, Z', Y', X') on device — the finalize_bits layout, feeding the
    bit-plane RLE transport (sliding_window.bits_fetch_begin): ~half the
    bytes per run of the uint32 word planes, and the host consumes each
    region as a plain array view instead of 47 strided bit-extraction
    passes."""
    k = probs_dev.shape[-1]
    out_shape = tuple(int(s) for s in out_shape)
    c = min(chunk_channels, k)
    pad = (-k) % c
    if pad:  # padded channels threshold False for any threshold >= 0
        probs_dev = jnp.pad(probs_dev, [(0, 0)] * (probs_dev.ndim - 1)
                            + [(0, pad)], constant_values=-60000.0)
    resize = _resize_chunk_fn(probs_dev.shape[:-1], out_shape, c)
    tb = _threshold_bits_fn(float(threshold))
    chunks = [tb(resize(probs_dev, np.int32(base)))
              for base in range(0, k + pad, c)]
    out = jnp.concatenate(chunks, axis=0)
    return out[:k] if pad else out


def segmentation_from_regions_bits(masks_kzyx: np.ndarray,
                                   region_class_order) -> np.ndarray:
    """Host-side: class-major region masks (K, Z, Y, X) bool -> labelmap
    written in region_class_order (later regions overwrite earlier ones,
    matching segmentation_from_probs)."""
    seg = np.zeros(masks_kzyx.shape[1:], np.float32)
    for i, cls in enumerate(region_class_order):
        seg[masks_kzyx[i]] = cls
    return seg


def segmentation_from_regions_packed(packed_host: np.ndarray,
                                     region_class_order) -> np.ndarray:
    """Host-side: packed region bits (Z,Y,X,nwords) -> labelmap written in
    region_class_order (later regions overwrite earlier ones, matching
    segmentation_from_probs)."""
    seg = np.zeros(packed_host.shape[:-1], np.float32)
    for i, cls in enumerate(region_class_order):
        bit = (packed_host[..., i // 32] >> np.uint32(i % 32)) & 1
        seg[bit.astype(bool)] = cls
    return seg
