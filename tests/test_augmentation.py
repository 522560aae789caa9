import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multitalent_tpu.augment import intensity as I
from multitalent_tpu.augment import spatial as S
from multitalent_tpu.augment.params import default_3D_augmentation_params, get_patch_size
from multitalent_tpu.augment.pipeline import ds_scales_from_pools, make_augment_fn

KEY = jax.random.PRNGKey(0)


def test_get_patch_size_enlarges_for_rotation():
    out = get_patch_size((96, 192, 192), (-0.5236, 0.5236), (-0.5236, 0.5236),
                         (-0.5236, 0.5236), (0.7, 1.4))
    assert all(o > p for o, p in zip(out, (96, 192, 192)))
    # no rotation, no scaling -> unchanged
    same = get_patch_size((32, 32, 32), 0.0, 0.0, 0.0, (1.0, 1.4))
    np.testing.assert_array_equal(same, (32, 32, 32))


def test_spatial_augment_identity_when_p_zero():
    rng = np.random.default_rng(0)
    data = jnp.array(rng.standard_normal((2, 12, 12, 12, 1)).astype(np.float32))
    seg = jnp.array(rng.integers(0, 3, (2, 12, 12, 12)).astype(np.float32))
    d, s = S.spatial_augment(KEY, data, seg, (8, 8, 8), p_rot=0.0, p_scale=0.0)
    # identity transform = center crop
    np.testing.assert_allclose(d, data[:, 2:10, 2:10, 2:10, :], atol=1e-5)
    np.testing.assert_array_equal(s, seg[:, 2:10, 2:10, 2:10])


def test_spatial_augment_rotates():
    data = jnp.zeros((1, 16, 16, 16, 1)).at[:, :, 8:, :, :].set(1.0)
    seg = jnp.zeros((1, 16, 16, 16))
    d, _ = S.spatial_augment(jax.random.PRNGKey(3), data, seg, (12, 12, 12),
                             p_rot=1.0, p_scale=0.0)
    ref, _ = S.spatial_augment(jax.random.PRNGKey(3), data, seg, (12, 12, 12),
                               p_rot=0.0, p_scale=0.0)
    assert not np.allclose(d, ref)
    assert np.all(np.isfinite(d))


def test_mirror_augment_joint():
    data = jnp.arange(2 * 4 * 4 * 4, dtype=jnp.float32).reshape(2, 4, 4, 4, 1)
    seg = data[..., 0] * 10
    d, s = S.mirror_augment(jax.random.PRNGKey(1), data, seg)
    # data and seg must be flipped consistently
    np.testing.assert_allclose(np.asarray(d[..., 0]) * 10, np.asarray(s), rtol=1e-6)


def test_downsample_seg_for_ds():
    seg = jnp.arange(2 * 8 * 8 * 8, dtype=jnp.float32).reshape(2, 8, 8, 8)
    scales = [[1, 1, 1], [0.5, 0.5, 0.5], [0.5, 0.25, 0.25]]
    outs = S.downsample_seg_for_ds(seg, scales)
    assert outs[0].shape == (2, 8, 8, 8)
    assert outs[1].shape == (2, 4, 4, 4)
    assert outs[2].shape == (2, 4, 2, 2)
    np.testing.assert_array_equal(outs[1], seg[:, ::2, ::2, ::2])


def test_ds_scales_from_pools():
    pools = [[2, 2, 2], [2, 2, 2], [1, 2, 2]]
    scales = ds_scales_from_pools(pools)
    assert scales[0] == [1.0, 1.0, 1.0]
    assert scales[1] == [0.5, 0.5, 0.5]
    assert scales[2] == [0.25, 0.25, 0.25]
    assert len(scales) == 3


def test_intensity_transforms_identity_at_p0_and_change_at_p1():
    rng = np.random.default_rng(1)
    data = jnp.array(rng.standard_normal((2, 8, 8, 8, 2)).astype(np.float32))
    for fn in (I.gaussian_noise, I.brightness_multiplicative, I.contrast_augmentation,
               I.gamma_augmentation):
        out0 = fn(KEY, data, p=0.0)
        np.testing.assert_array_equal(out0, data)
        out1 = fn(KEY, data, p=1.0)
        assert not np.array_equal(np.asarray(out1), np.asarray(data))
        assert np.all(np.isfinite(out1))
    out_blur = I.gaussian_blur(KEY, data, p=1.0, p_per_channel=1.0)
    assert float(jnp.std(out_blur)) < float(jnp.std(data))
    out_lr = I.simulate_low_resolution(KEY, data, p=1.0, p_per_channel=1.0)
    assert np.all(np.isfinite(out_lr))


def test_contrast_preserves_mean():
    rng = np.random.default_rng(2)
    data = jnp.array(rng.standard_normal((1, 8, 8, 8, 1)).astype(np.float32))
    out = I.contrast_augmentation(KEY, data, p=1.0, preserve_range=False)
    np.testing.assert_allclose(float(out.mean()), float(data.mean()), atol=1e-5)


def test_gamma_retains_stats():
    rng = np.random.default_rng(3)
    data = jnp.array((rng.standard_normal((1, 8, 8, 8, 1)) * 2 + 5).astype(np.float32))
    out = I.gamma_augmentation(KEY, data, p=1.0)
    np.testing.assert_allclose(float(out.mean()), float(data.mean()), rtol=1e-3)
    np.testing.assert_allclose(float(out.std()), float(data.std()), rtol=1e-2)


def test_full_pipeline():
    params = dict(default_3D_augmentation_params)
    pools = [[2, 2, 2], [2, 2, 2]]
    ds_scales = ds_scales_from_pools(pools)
    final = (8, 12, 12)
    enlarged = get_patch_size(final, params["rotation_x"], params["rotation_y"],
                              params["rotation_z"], params["scale_range"])
    aug = make_augment_fn(final, ds_scales, params)
    rng = np.random.default_rng(4)
    data = rng.standard_normal((2, 1, *enlarged)).astype(np.float32)
    seg = rng.integers(-1, 3, (2, 1, *enlarged)).astype(np.float32)
    d, targets = aug(KEY, jnp.array(data), jnp.array(seg))
    assert d.shape == (2, *final, 1)
    assert targets[0].shape == (2, *final)
    assert targets[1].shape == (2, 4, 6, 6)
    assert float(targets[0].min()) >= 0  # -1 labels removed
    assert np.all(np.isfinite(d))


def test_scale_branch_matches_gather_warp():
    """The separable matmul resample (branch 1) must equal the trilinear
    gather warp on the same scale factors (corner weights are separable
    products, so per-axis matmuls reproduce map_coordinates exactly)."""
    rng = np.random.default_rng(7)
    in_shape, final = (14, 12, 16), (8, 8, 8)
    d = jnp.array(rng.standard_normal((*in_shape, 2)).astype(np.float32))
    s = jnp.array(rng.integers(-1, 3, in_shape).astype(np.float32))
    grid = S._centered_grid(final)
    center_in = jnp.array([(n - 1) / 2.0 for n in in_shape], jnp.float32)
    for scale in ((0.8, 1.3, 1.0), (1.4, 1.4, 1.4), (0.7, 0.7, 0.7)):
        sc = jnp.asarray(scale, jnp.float32)
        coords = grid * sc[:, None] + center_in[:, None]
        d_ref = jax.vmap(lambda v: S._warp_volume(v, coords, 1, 0.0),
                         in_axes=-1, out_axes=-1)(d).reshape(final + (2,))
        s_ref = jnp.round(S._warp_volume(s, coords, 1, -1.0)).reshape(final)
        d_got, s_got = S._scale_resample(d, s, sc, in_shape, final, 1)
        np.testing.assert_allclose(d_got, d_ref, atol=1e-4)
        np.testing.assert_allclose(s_got, s_ref, atol=1e-4)
        # nearest-seg variant (order_seg=0, the MultiTalent setting)
        s_ref0 = S._warp_volume(s, coords, 0, -1.0).reshape(final)
        _, s_got0 = S._scale_resample(d, s, sc, in_shape, final, 0)
        np.testing.assert_allclose(s_got0, s_ref0, atol=1e-5)


def test_spatial_augment_scale_only_branch_runs():
    """p_scale=1, p_rot=0 routes every sample through the matmul branch and
    must agree with the gather warp on the same RNG draws."""
    rng = np.random.default_rng(8)
    data = jnp.array(rng.standard_normal((3, 12, 12, 12, 1)).astype(np.float32))
    seg = jnp.array(rng.integers(0, 3, (3, 12, 12, 12)).astype(np.float32))
    d, s = S.spatial_augment(KEY, data, seg, (8, 8, 8), p_rot=0.0, p_scale=1.0)
    assert d.shape == (3, 8, 8, 8, 1) and s.shape == (3, 8, 8, 8)
    assert np.all(np.isfinite(d))
    assert set(np.unique(np.asarray(s))) <= {-1.0, 0.0, 1.0, 2.0}


def test_shear_warp_exact_on_linear_field():
    """Shear-decomposition rotation (9 Paeth passes + scale) realizes EXACTLY
    the map R @ diag(sc): on a linear intensity field every interpolation
    scheme is exact, so interior voxels must equal the analytic value."""
    in_shape, final = (24, 24, 24), (10, 10, 10)
    zz, yy, xx = np.meshgrid(*[np.arange(n, dtype=np.float32) - (n - 1) / 2
                               for n in in_shape], indexing="ij")
    coef = np.asarray([0.7, -0.3, 0.2], np.float32)
    vol = coef[0] * zz + coef[1] * yy + coef[2] * xx
    d = jnp.asarray(vol[..., None])
    s = jnp.zeros(in_shape, jnp.float32)
    for angles, sc in (((0.3, -0.2, 0.4), (1.0, 1.0, 1.0)),
                       ((0.5, 0.1, -0.3), (0.9, 1.2, 1.1)),
                       ((0.52, 0.0, 0.0), (1.0, 1.0, 1.0))):
        a1, a2, a3 = (jnp.float32(a) for a in angles)
        scv = jnp.asarray(sc, jnp.float32)
        dv, _ = S._shear_warp(d, s, a1, a2, a3, scv, in_shape, final, 1)
        r = np.asarray(S.rotation_matrix_3d(a1, a2, a3))
        # analytic: out(p) = vol(R @ (sc * p_centered)) = coef . R (sc p)
        fz, fy, fx = final
        pz, py, px = np.meshgrid(*[np.arange(n, dtype=np.float32) - (n - 1) / 2
                                   for n in final], indexing="ij")
        pts = np.stack([pz, py, px], 0).reshape(3, -1)
        expected = (coef @ (r @ (np.asarray(sc)[:, None] * pts))).reshape(final)
        got = np.asarray(dv[..., 0])
        # interior only: boundary rows see cval bleed-in
        sl = (slice(2, -2),) * 3
        np.testing.assert_allclose(got[sl], expected[sl], atol=5e-4)


def test_shear_warp_close_to_gather_on_smooth_volume():
    """On a smooth blob the shear warp and the trilinear gather warp agree to
    interpolation-scheme tolerance; seg labels agree almost everywhere."""
    in_shape, final = (20, 20, 20), (10, 10, 10)
    zz, yy, xx = np.meshgrid(*[np.linspace(-1, 1, n, dtype=np.float32)
                               for n in in_shape], indexing="ij")
    blob = np.exp(-((zz * 1.3) ** 2 + yy ** 2 + (xx * 0.8) ** 2) * 3)
    d = jnp.asarray(blob[..., None])
    s = jnp.asarray((blob > 0.5).astype(np.float32))
    a1, a2, a3 = jnp.float32(0.4), jnp.float32(-0.3), jnp.float32(0.2)
    sc = jnp.asarray((1.1, 0.9, 1.0), jnp.float32)
    dv, sv = S._shear_warp(d, s, a1, a2, a3, sc, in_shape, final, 1)
    grid = S._centered_grid(final)
    center_in = jnp.asarray([(n - 1) / 2.0 for n in in_shape], jnp.float32)
    r = S.rotation_matrix_3d(a1, a2, a3)
    coords = (r @ (grid * sc[:, None])) + center_in[:, None]
    d_ref = S._warp_volume(d[..., 0], coords, 1, 0.0).reshape(final)
    s_ref = jnp.round(S._warp_volume(s, coords, 1, -1.0)).reshape(final)
    assert float(jnp.max(jnp.abs(dv[..., 0] - d_ref))) < 0.06
    assert float(jnp.mean(jnp.abs(sv - s_ref))) < 0.05
