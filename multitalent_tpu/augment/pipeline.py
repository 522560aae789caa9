"""The fused on-device augmentation pipeline.

One jitted function per (patch geometry, params) combination applies the full moreDA
transform chain (data_augmentation_moreDA.py:41-209) to a batch on the accelerator:

  spatial warp (rot/scale/center-crop) -> noise -> blur -> brightness -> contrast ->
  lowres sim -> gamma(inv) -> gamma -> mirror -> mask-norm zeroing ->
  remove -1 label -> deep-supervision seg targets

Input comes from the host PatchSampler as channels-first (B, C, Z', Y', X') float32
(the storage layout); the pipeline transposes once to channels-last for the model.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from multitalent_tpu.augment import intensity as I
from multitalent_tpu.augment import spatial as S


def ds_scales_from_pools(pool_op_kernel_sizes) -> list[list[float]]:
    """Deep-supervision target scales: identity plus cumulative inverse pool strides,
    dropping the deepest level (nnUNetTrainerV2.setup_DA_params)."""
    cum = np.cumprod(np.vstack(pool_op_kernel_sizes), axis=0)
    ndim = cum.shape[1]
    return [[1.0] * ndim] + (1.0 / cum).tolist()[:-1]


def make_augment_fn(final_patch_size, ds_scales, params, num_modalities: int = 1):
    """Returns augment(rng, data_bc, seg_b1) -> (data BZYXC, [seg targets B,z,y,x])."""
    final_shape = tuple(int(s) for s in final_patch_size)
    rot_x = tuple(params["rotation_x"])
    rot_y = tuple(params["rotation_y"])
    rot_z = tuple(params["rotation_z"])
    scale_range = tuple(params["scale_range"])
    mirror_axes = tuple(params.get("mirror_axes", (0, 1, 2)))
    do_mirror = bool(params.get("do_mirror", True))
    order_seg = int(params.get("order_seg", 1))
    dummy_2d = bool(params.get("dummy_2D", False))
    mask_norm = params.get("mask_was_used_for_normalization")
    use_mask_any = bool(mask_norm) and any(bool(v) for v in dict(mask_norm).values())
    ds_scales = [tuple(s) for s in ds_scales]

    @jax.jit
    def augment(rng, data_bc, seg_b1):
        # (B, C, Z', Y', X') -> (B, Z', Y', X', C); seg -> (B, Z', Y', X')
        data = jnp.moveaxis(data_bc, 1, -1).astype(jnp.float32)
        seg = seg_b1[:, 0].astype(jnp.float32)

        keys = jax.random.split(rng, 10)
        if len(final_shape) == 2:
            data, seg = S.spatial_augment_2d(
                keys[0], data, seg, final_shape, scale_range=scale_range,
                rot=rot_x, p_rot=params.get("p_rot", 0.2),
                p_scale=params.get("p_scale", 0.2), order_seg=order_seg)
        else:
            data, seg = S.spatial_augment(
                keys[0], data, seg, final_shape, scale_range=scale_range,
                rot_x=rot_x, rot_y=rot_y, rot_z=rot_z,
                p_rot=params.get("p_rot", 0.2), p_scale=params.get("p_scale", 0.2),
                order_seg=order_seg, dummy_2d=dummy_2d,
                rot_p_per_axis=float(params.get("rotation_p_per_axis", 1.0)),
                independent_scale=bool(params.get(
                    "independent_scale_factor_for_each_axis", False)))

        data = I.gaussian_noise(keys[1], data, p=params.get("p_gaussian_noise", 0.1),
                                variance=tuple(params.get("gaussian_noise_variance", (0, 0.1))))
        data = I.gaussian_blur(keys[2], data, p=params.get("p_gaussian_blur", 0.2),
                               p_per_channel=params.get("p_blur_per_channel", 0.5),
                               sigma_range=tuple(params.get("gaussian_blur_sigma", (0.5, 1.0))))
        data = I.brightness_multiplicative(
            keys[3], data, p=params.get("p_brightness_mult", 0.15),
            mult_range=tuple(params.get("brightness_mult_range", (0.75, 1.25))))
        if params.get("do_additive_brightness", False):
            data = I.brightness_additive(
                keys[9], data,
                p=params.get("additive_brightness_p_per_sample", 0.15),
                mu=params.get("additive_brightness_mu", 0.0),
                sigma=params.get("additive_brightness_sigma", 0.1))
        data = I.contrast_augmentation(
            keys[4], data, p=params.get("p_contrast", 0.15),
            contrast_range=tuple(params.get("contrast_range", (0.75, 1.25))))
        data = I.simulate_low_resolution(
            keys[5], data, p=params.get("p_lowres", 0.25),
            p_per_channel=params.get("p_lowres_per_channel", 0.5),
            zoom_range=tuple(params.get("lowres_zoom_range", (0.5, 1.0))))
        if params.get("do_gamma", True):
            data = I.gamma_augmentation(keys[6], data,
                                        p=params.get("p_gamma_invert", 0.1),
                                        gamma_range=tuple(params.get("gamma_range", (0.7, 1.5))),
                                        invert=True)
            data = I.gamma_augmentation(keys[7], data, p=params.get("p_gamma", 0.3),
                                        gamma_range=tuple(params.get("gamma_range", (0.7, 1.5))),
                                        invert=False)
        if do_mirror:
            data, seg = S.mirror_augment(keys[8], data, seg, mirror_axes=mirror_axes)

        if use_mask_any:
            # MaskTransform: zero image voxels outside the nonzero-mask (seg == -1)
            data = jnp.where((seg == -1)[..., None], 0.0, data)

        seg = jnp.where(seg == -1, 0.0, seg)  # RemoveLabelTransform(-1 -> 0)
        targets = S.downsample_seg_for_ds(seg, ds_scales)
        return data, targets

    return augment


def make_cascade_augment_fn(final_patch_size, ds_scales, params,
                            num_modalities: int, num_prev_classes: int):
    """Cascade training pipeline: the previous-stage segmentation rides along as
    one-hot channels (MoveSegAsOneHotToData role). Chain order matches
    get_moreDA_augmentation's cascade path: spatial warp (joint) -> intensity
    chain (image channels ONLY) -> mask/remove-label -> one-hot + random binary
    dilation/erosion corruption (ApplyRandomBinaryOperatorTransform parity,
    pyramid_augmentations.py:66-99) -> joint mirror -> DS targets. Random
    connected-component removal corruption happens host-side in the cascade patch
    sampler (scipy labeling, pyramid_augmentations.py:23-63)."""
    final_shape = tuple(int(s) for s in final_patch_size)
    rot_x = tuple(params["rotation_x"])
    rot_y = tuple(params["rotation_y"])
    rot_z = tuple(params["rotation_z"])
    scale_range = tuple(params["scale_range"])
    dummy_2d = bool(params.get("dummy_2D", False))
    p_binary = float(params.get("cascade_random_binary_transform_p", 0.4))
    p_binary_label = float(
        params.get("cascade_random_binary_transform_p_per_label", 1.0))
    strel_range = tuple(
        params.get("cascade_random_binary_transform_size", (1, 8)))
    strel_size = max(1, int(round(sum(strel_range) / 2.0)))
    mirror_axes = tuple(params.get("mirror_axes", (0, 1, 2)))
    do_mirror = bool(params.get("do_mirror", True))

    # the base pipeline applies its mirror with keys[8] of split(rng, 9); to mirror
    # jointly we disable base mirroring and mirror here instead
    params_nomirror = dict(params)
    params_nomirror["do_mirror"] = False
    base = make_augment_fn(final_patch_size, ds_scales, params_nomirror,
                           num_modalities)

    @jax.jit
    def augment(rng, data_bc, seg_b2):
        # seg_b2: (B, 2, ...): [GT labels, previous-stage labels]
        keys = jax.random.split(rng, 9)
        k_morph = jax.random.fold_in(rng, 1234)
        k_mirror = keys[8]

        data, targets = base(rng, data_bc, seg_b2[:, 0:1])

        # warp the previous-stage one-hots with the SAME spatial transform
        # (spatial_augment is a pure function of keys[0]): linear interpolation of
        # the indicators + 0.5 threshold
        prev_oh = jax.nn.one_hot(seg_b2[:, 1].astype(jnp.int32),
                                 num_prev_classes + 1, dtype=jnp.float32)[..., 1:]
        dummy_seg = jnp.zeros(seg_b2[:, 0].shape, jnp.float32)
        prev_w, _ = S.spatial_augment(
            keys[0], prev_oh, dummy_seg, final_shape, scale_range=scale_range,
            rot_x=rot_x, rot_y=rot_y, rot_z=rot_z,
            p_rot=params.get("p_rot", 0.2), p_scale=params.get("p_scale", 0.2),
            order_seg=1, dummy_2d=dummy_2d)
        prev_w = (prev_w > 0.5).astype(jnp.float32)
        prev_w = S_random_binary_morphology(k_morph, prev_w, p_binary,
                                            size=strel_size,
                                            p_per_label=p_binary_label)

        full = jnp.concatenate([data, prev_w], axis=-1)
        if do_mirror:
            full, seg0 = S.mirror_augment(k_mirror, full, targets[0],
                                          mirror_axes=mirror_axes)
            targets = S.downsample_seg_for_ds(seg0, [tuple(s) for s in ds_scales])
        return full, targets

    return augment


def S_random_binary_morphology(rng, onehot, p_per_sample: float = 0.4,
                               size: int = 3, p_per_label: float = 1.0):
    """Random per-(sample, channel) binary dilation or erosion via max/min pooling
    (structuring element = cube of `size`). Two-level gating matches
    ApplyRandomBinaryOperatorTransform (pyramid_augmentations.py:95-130):
    a per-sample draw against p_per_sample, then per-label draws against
    p_per_label. The reference samples the structuring-element size per
    application from a range; the pooling window must be static under jit, so
    callers pass the range's midpoint (documented deviation)."""
    b, c = onehot.shape[0], onehot.shape[-1]
    k_do, k_lab, k_op = jax.random.split(rng, 3)
    do_sample = jax.random.uniform(k_do, (b, 1)) < p_per_sample
    do_label = jax.random.uniform(k_lab, (b, c)) < p_per_label
    do = do_sample & do_label
    dilate = jax.random.bernoulli(k_op, 0.5, (b, c))
    window = (1,) + (size,) * (onehot.ndim - 2) + (1,)
    ones = (1,) * onehot.ndim
    dilated = jax.lax.reduce_window(onehot, -jnp.inf, jax.lax.max, window, ones,
                                    "SAME")
    eroded = jax.lax.reduce_window(onehot, jnp.inf, jax.lax.min, window, ones,
                                   "SAME")
    shape_bc = (b,) + (1,) * (onehot.ndim - 2) + (c,)
    do_b = do.reshape(shape_bc)
    dil_b = dilate.reshape(shape_bc)
    return jnp.where(do_b, jnp.where(dil_b, dilated, eroded), onehot)


def make_cascade_val_transform_fn(final_patch_size, ds_scales, params,
                                  num_modalities: int, num_prev_classes: int):
    """Validation-path cascade transform: center crop + one-hot append, no
    corruption."""
    import jax.nn as jnn

    base = make_val_transform_fn(final_patch_size, ds_scales, params,
                                 num_modalities)
    final_shape = tuple(int(s) for s in final_patch_size)

    @jax.jit
    def transform(data_bc, seg_b2):
        data, targets = base(data_bc, seg_b2[:, 0:1])
        prev = seg_b2[:, 1]
        starts = [(prev.shape[i + 1] - final_shape[i]) // 2 for i in range(3)]
        sl = (slice(None),) + tuple(slice(s, s + f)
                                    for s, f in zip(starts, final_shape))
        prev_oh = jnn.one_hot(prev[sl].astype(jnp.int32), num_prev_classes + 1,
                              dtype=jnp.float32)[..., 1:]
        return jnp.concatenate([data, prev_oh], axis=-1), targets

    return transform


def make_val_transform_fn(final_patch_size, ds_scales, params, num_modalities: int = 1):
    """Validation-path transform: center crop + mask/remove-label + DS targets only
    (the reference's val pipeline applies no stochastic transforms)."""
    final_shape = tuple(int(s) for s in final_patch_size)
    mask_norm = params.get("mask_was_used_for_normalization")
    use_mask_any = bool(mask_norm) and any(bool(v) for v in dict(mask_norm).values())
    ds_scales = [tuple(s) for s in ds_scales]

    @jax.jit
    def transform(data_bc, seg_b1):
        data = jnp.moveaxis(data_bc, 1, -1).astype(jnp.float32)
        seg = seg_b1[:, 0].astype(jnp.float32)
        # center crop to final shape
        starts = [(data.shape[i + 1] - final_shape[i]) // 2
                  for i in range(len(final_shape))]
        sl = (slice(None),) + tuple(slice(s, s + f) for s, f in zip(starts, final_shape))
        data = data[sl]
        seg = seg[sl]
        if use_mask_any:
            data = jnp.where((seg == -1)[..., None], 0.0, data)
        seg = jnp.where(seg == -1, 0.0, seg)
        return data, S.downsample_seg_for_ds(seg, ds_scales)

    return transform
