"""Sliding-window tiled inference engine.

Parity target: the SegmentationNetwork inference engine
(nnunet/network_architecture/neural_network.py:73-591): step-grid computation
(`_compute_steps_for_sliding_window`:261-285), gaussian importance map
(`_get_gaussian`:245-259, sigma = patch/8), per-tile mirror-TTA prediction
accumulated with gaussian weights and divided by the accumulated weight
(`_internal_predict_3D_3Dconv_tiled`:287-428, `_internal_maybe_mirror_and_pred_3D`
:502-591).

TPU-native design (all inside ONE jitted program per (patch, #tiles-bucket)):

- the whole padded volume lives in HBM; tiles are `dynamic_slice` views
- mirror TTA is a single batched forward over all 2^|mirror_axes| flip combinations
  (the reference runs 8 sequential forward passes per tile)
- gaussian-weighted accumulation is a `lax.scan` over tiles with
  dynamic_update_slice read-modify-write on fp32 accumulators — no host round-trips
- variable tile counts are bucketed: the coordinate list is padded with zero-weight
  tiles so XLA compiles one program per bucket instead of one per image shape
  (zero-weight tiles contribute exactly nothing, preserving numerical parity)
"""
from __future__ import annotations

from functools import lru_cache, partial
from itertools import combinations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter


def compute_steps_for_sliding_window(patch_size, image_size, step_size: float) -> list[list[int]]:
    """Per-axis start coordinates (neural_network.py:261-285): first step at 0, last
    step flush with the image end, actual spacing <= step_size * patch (evenly
    distributed)."""
    assert all(i >= j for i, j in zip(image_size, patch_size)), \
        "image must be at least as large as the patch"
    assert 0 < step_size <= 1
    target_step_sizes_in_voxels = [i * step_size for i in patch_size]
    num_steps = [int(np.ceil((i - k) / j)) + 1
                 for i, j, k in zip(image_size, target_step_sizes_in_voxels, patch_size)]
    steps = []
    for dim in range(len(patch_size)):
        max_step_value = image_size[dim] - patch_size[dim]
        if num_steps[dim] > 1:
            actual_step_size = max_step_value / (num_steps[dim] - 1)
        else:
            actual_step_size = 1e8  # only one step at 0
        steps.append([int(np.round(actual_step_size * i)) for i in range(num_steps[dim])])
    return steps


def get_gaussian_importance_map(patch_size, sigma_scale: float = 1.0 / 8) -> np.ndarray:
    """Gaussian tile-weighting map, max-normalized, zeros clamped to the smallest
    nonzero value (neural_network.py:245-259)."""
    tmp = np.zeros(patch_size)
    center_coords = [i // 2 for i in patch_size]
    sigmas = [i * sigma_scale for i in patch_size]
    tmp[tuple(center_coords)] = 1
    g = gaussian_filter(tmp, sigmas, 0, mode="constant", cval=0)
    g = g / np.max(g)
    g = g.astype(np.float32)
    g[g == 0] = np.min(g[g != 0])
    return g


def pad_to_patch(volume_zyxc: np.ndarray, patch_size) -> tuple[np.ndarray, list[slice]]:
    """Symmetric zero-pad so every axis >= patch (pad_nd_image semantics as used by
    the tiled path); returns (padded, slicer to undo)."""
    shape = volume_zyxc.shape[:-1]
    new_shape = [max(s, p) for s, p in zip(shape, patch_size)]
    diff = [n - s for n, s in zip(new_shape, shape)]
    lo = [d // 2 for d in diff]
    hi = [d - l for d, l in zip(diff, lo)]
    pad = [(l, h) for l, h in zip(lo, hi)] + [(0, 0)]
    padded = np.pad(volume_zyxc, pad, mode="constant")
    slicer = [slice(l, l + s) for l, s in zip(lo, shape)]
    return padded, slicer


def mirror_combinations(mirror_axes: tuple[int, ...]) -> list[tuple[int, ...]]:
    """All subsets of the mirrorable spatial axes (2^m combos incl. identity)."""
    combos: list[tuple[int, ...]] = []
    for r in range(len(mirror_axes) + 1):
        combos.extend(combinations(mirror_axes, r))
    return combos


def bucket_num_tiles(n: int) -> int:
    """Round the tile count up to a small set of buckets to bound recompilation."""
    if n <= 8:
        return 8
    return int(2 ** np.ceil(np.log2(n)))


@lru_cache(maxsize=32)
def _make_tiled_runner(apply_fn_id, patch_size, in_channels, num_classes,
                       mirror_axes, use_gaussian, nonlin, n_tiles_padded,
                       tta_chunk):
    """Builds + jits the scan-over-tiles program. apply_fn_id carries the callable
    (wrapped for hashability by the caller)."""
    apply_fn = apply_fn_id.fn
    patch = tuple(int(p) for p in patch_size)
    combos = mirror_combinations(mirror_axes)
    if use_gaussian:
        gauss = jnp.asarray(get_gaussian_importance_map(patch))[..., None]
    else:
        gauss = jnp.ones(patch, jnp.float32)[..., None]
    # Flip combos are processed in batched chunks of size `tta_chunk`: full 8-way
    # batching is fastest but a (96,192,192,47) fp32 prob tensor x8 TTA plus the
    # HBM accumulator overflows a 16G chip; the chunk bounds live activations.
    # Crucially the flips are DATA, not structure: the scan runs over
    # (tile, combo-chunk) steps and applies flips with jnp.where-selected
    # jnp.flip results, so the compiled program contains exactly ONE forward pass
    # regardless of TTA factor (8 unrolled forwards made XLA compile times
    # explode for the 6-stage MultiTalent net).
    chunk = max(1, min(int(tta_chunk), len(combos)))
    n_chunks = (len(combos) + chunk - 1) // chunk
    # (n_chunks, chunk, 3) flip masks per spatial axis; repeat the identity combo
    # to pad the last chunk (its contribution is divided out by averaging over
    # `valid` below)
    flip_masks = np.zeros((n_chunks, chunk, 3), np.bool_)
    valid = np.zeros((n_chunks, chunk, 1), np.float32)
    for idx, c in enumerate(combos):
        flip_masks[idx // chunk, idx % chunk, list(c)] = True
        valid[idx // chunk, idx % chunk, 0] = 1.0

    def flip_sel(x, bits):
        # x (*spatial, C); bits (3,) bool — flip each spatial axis where set
        for ax in range(3):
            x = jnp.where(bits[ax], jnp.flip(x, axis=ax), x)
        return x

    def forward_chunk(params, tile, bits_chunk, valid_chunk):
        batch = jax.vmap(lambda b: flip_sel(tile, b))(bits_chunk)
        logits = apply_fn(params, batch).astype(jnp.float32)
        if nonlin == "softmax":
            probs = jax.nn.softmax(logits, axis=-1)
        elif nonlin == "sigmoid":
            probs = jax.nn.sigmoid(logits)
        else:
            probs = logits
        unflipped = jax.vmap(flip_sel)(probs, bits_chunk)
        v = valid_chunk.reshape((valid_chunk.shape[0],) + (1,) * (unflipped.ndim - 1))
        return jnp.sum(unflipped * v, axis=0)

    @jax.jit
    def run(params, padded_volume, coords, tile_weights):
        out_shape = padded_volume.shape[:-1] + (num_classes,)
        acc = jnp.zeros(out_shape, jnp.float32)
        cnt = jnp.zeros(padded_volume.shape[:-1] + (1,), jnp.float32)
        tile_sum0 = jnp.zeros((*patch, num_classes), jnp.float32)
        bits = jnp.asarray(flip_masks)
        vmask = jnp.asarray(valid)
        n_tiles = coords.shape[0]

        def body(carry, step):
            a, c, tile_sum = carry
            i = step // n_chunks          # tile index
            j = step % n_chunks           # combo-chunk index
            z, y, x = coords[i, 0], coords[i, 1], coords[i, 2]
            tile = jax.lax.dynamic_slice(
                padded_volume, (z, y, x, 0), (*patch, in_channels))
            tile_sum = tile_sum + forward_chunk(params, tile, bits[j], vmask[j])
            # on the tile's last chunk: fold the averaged TTA prediction into the
            # global accumulators and reset the per-tile sum
            is_last = (j == n_chunks - 1).astype(jnp.float32)
            w = tile_weights[i] * is_last
            probs = tile_sum / len(combos)
            cur = jax.lax.dynamic_slice(a, (z, y, x, 0), (*patch, num_classes))
            a = jax.lax.dynamic_update_slice(a, cur + probs * gauss * w,
                                             (z, y, x, 0))
            cur_c = jax.lax.dynamic_slice(c, (z, y, x, 0), (*patch, 1))
            c = jax.lax.dynamic_update_slice(c, cur_c + gauss * w, (z, y, x, 0))
            tile_sum = tile_sum * (1.0 - is_last)
            return (a, c, tile_sum), None

        (acc, cnt, _), _ = jax.lax.scan(
            body, (acc, cnt, tile_sum0), jnp.arange(n_tiles * n_chunks))
        # guard only voxels never touched by any tile (cannot occur for a valid
        # step grid); tiny gaussian-tail weights must divide exactly (parity with
        # aggregated_results / aggregated_nb_of_predictions, neural_network.py:399)
        return acc / jnp.where(cnt == 0, 1.0, cnt)

    return run


class _HashableFn:
    """Identity-hashed wrapper so lru_cache can key on the apply callable."""

    def __init__(self, fn):
        self.fn = fn

    def __hash__(self):
        return id(self.fn)

    def __eq__(self, other):
        return isinstance(other, _HashableFn) and other.fn is self.fn


class SlidingWindowPredictor:
    """Reusable tiled predictor for one network configuration.

    `apply_fn(params, batch_bzyxc) -> logits_bzyxc` must return full-resolution
    logits (deep supervision off)."""

    def __init__(self, apply_fn, patch_size, in_channels: int, num_classes: int,
                 nonlin: str = "softmax", step_size: float = 0.5,
                 do_mirroring: bool = True, mirror_axes: tuple[int, ...] = (0, 1, 2),
                 use_gaussian: bool = True, tta_chunk: int = 2):
        self.apply_fn = _HashableFn(apply_fn)
        self.patch_size = tuple(int(p) for p in patch_size)
        self.in_channels = in_channels
        self.num_classes = num_classes
        self.nonlin = nonlin
        self.step_size = step_size
        self.mirror_axes = tuple(mirror_axes) if do_mirroring else ()
        self.use_gaussian = use_gaussian
        self.tta_chunk = tta_chunk

    def tile_coords(self, image_shape) -> np.ndarray:
        steps = compute_steps_for_sliding_window(self.patch_size, image_shape,
                                                 self.step_size)
        return np.array([(z, y, x) for z in steps[0] for y in steps[1]
                         for x in steps[2]], dtype=np.int32)

    def __call__(self, params, volume_czyx: np.ndarray) -> np.ndarray:
        """volume (C, Z, Y, X) float32 -> class/region probabilities (K, Z, Y, X)."""
        vol = np.moveaxis(np.ascontiguousarray(volume_czyx, np.float32), 0, -1)
        padded, slicer = pad_to_patch(vol, self.patch_size)
        coords = self.tile_coords(padded.shape[:-1])
        n = coords.shape[0]
        n_padded = bucket_num_tiles(n)
        weights = np.zeros((n_padded,), np.float32)
        weights[:n] = 1.0
        coords_padded = np.zeros((n_padded, 3), np.int32)
        coords_padded[:n] = coords

        runner = _make_tiled_runner(
            self.apply_fn, self.patch_size, self.in_channels, self.num_classes,
            self.mirror_axes, self.use_gaussian, self.nonlin, n_padded,
            self.tta_chunk)
        probs = runner(params, padded, jnp.asarray(coords_padded),
                       jnp.asarray(weights))
        probs = np.asarray(probs)[tuple(slicer) + (slice(None),)]
        return np.moveaxis(probs, -1, 0)


def segmentation_from_probabilities(probs_kzyx: np.ndarray,
                                    regions_class_order=None) -> np.ndarray:
    """argmax labels, or thresholded region channels written in regions_class_order
    (neural_network.py:405-417)."""
    if regions_class_order is None:
        return np.argmax(probs_kzyx, axis=0).astype(np.int32)
    seg = np.zeros(probs_kzyx.shape[1:], np.int32)
    for i, c in enumerate(regions_class_order):
        seg[probs_kzyx[i] > 0.5] = c
    return seg
