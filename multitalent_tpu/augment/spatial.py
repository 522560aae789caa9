"""On-device batched spatial augmentation: one fused affine warp per sample
(rotation + scaling + center crop), replacing batchgenerators' SpatialTransform.

The enlarged host-sampled patch (B, Z', Y', X', C) is warped/cropped to the final
patch (B, Z, Y, X, C) in a single gather: output-grid coordinates are rotated, scaled
and re-centered, then sampled with jax.scipy.ndimage.map_coordinates (trilinear for
data, constant cval 0; nearest or trilinear-then-round for seg, cval -1).

Parity notes vs SpatialTransform (batchgenerators, configured by
data_augmentation_moreDA.py:66-111): same coordinate convention (centered grid,
coords scaled THEN rotated, scale>1 zooms out), same per-sample application
probabilities; interpolation is trilinear instead of cubic (TPU-native choice — the
64-tap cubic gather is not worth the HBM traffic for augmentation noise).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def rotation_matrix_3d(ax, ay, az):
    """R = Rx @ Ry @ Rz, matching batchgenerators' create_matrix_rotation_*_3d order."""
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rx @ ry @ rz


def _centered_grid(shape):
    """(3, Z*Y*X) coordinates centered on the patch center."""
    axes = [jnp.arange(s, dtype=jnp.float32) - (s - 1) / 2.0 for s in shape]
    zz, yy, xx = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([zz.ravel(), yy.ravel(), xx.ravel()])


def _warp_volume(vol, coords, order, cval):
    """vol (Z', Y', X'); coords (3, N) in input index space."""
    out = jax.scipy.ndimage.map_coordinates(vol, [coords[0], coords[1], coords[2]],
                                            order=order, mode="constant", cval=cval)
    return out


def _axis_resample_matrix(n_out, n_in, sc, order):
    """[n_out, n_in] 1-D resampling matrix for the centered scale map
    src(o) = (o - (n_out-1)/2) * sc + (n_in-1)/2.  Rows of an out-of-range
    output sample sum to < 1; the missing mass is the constant-mode cval
    weight (matching jax.scipy.ndimage.map_coordinates semantics exactly:
    trilinear corner weights are separable products, so per-axis application
    with per-axis cval correction reproduces the 3-D result)."""
    src = ((jnp.arange(n_out, dtype=jnp.float32) - (n_out - 1) / 2.0) * sc
           + (n_in - 1) / 2.0)
    cols = jnp.arange(n_in, dtype=jnp.float32)
    if order == 0:
        # map_coordinates order-0 rounds half AWAY from zero (scipy semantics),
        # not to even as jnp.round does
        nearest = jnp.sign(src) * jnp.floor(jnp.abs(src) + 0.5)
        return (cols[None, :] == nearest[:, None]).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - cols[None, :]))


def _scale_resample(d, s, scale, in_shape, final_shape, order_seg):
    """Scale-only warp as three MXU matmul contractions (no gather): exactly
    the trilinear (or nearest, for seg order 0) constant-mode result. Data
    cval 0 needs no correction; seg cval -1 enters via the per-axis missing
    row mass."""
    mats = [_axis_resample_matrix(final_shape[i], in_shape[i], scale[i], 1)
            for i in range(3)]
    out = jnp.einsum("az,zyxc->ayxc", mats[0], d)
    out = jnp.einsum("by,ayxc->abxc", mats[1], out)
    out = jnp.einsum("gx,abxc->abgc", mats[2], out)
    smats = mats if order_seg != 0 else [
        _axis_resample_matrix(final_shape[i], in_shape[i], scale[i], 0)
        for i in range(3)]
    sv = s
    for i, m in enumerate(smats):
        sv = jnp.moveaxis(jnp.tensordot(m, sv, axes=([1], [i])), 0, i)
        miss = 1.0 - jnp.sum(m, axis=1)
        shape = [1, 1, 1]
        shape[i] = final_shape[i]
        sv = sv + (-1.0) * miss.reshape(shape)
    if order_seg != 0:
        sv = jnp.round(sv)
    return out, sv


def _pass_matrix(n, offsets, order):
    """[J, n, n] per-batch-coordinate 1-D resampling matrices for
    src(i_out) = i_out + offsets[j] (linear interp or nearest)."""
    io = jnp.arange(n, dtype=jnp.float32)
    src = io[None, :] + offsets[:, None]             # (J, n_out)
    d = jnp.abs(src[:, :, None] - io[None, None, :])  # (J, n_out, n_in)
    if order == 0:
        nearest = jnp.sign(src) * jnp.floor(jnp.abs(src) + 0.5)
        return (io[None, None, :] == nearest[:, :, None]).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - d)


def _apply_axis_pass(vol, m, axis, batch_axis, cval):
    """Batched-matmul resample of `vol` along `axis`, matrices batched over
    `batch_axis`: out[.., j, .., io, ..] = sum_ii m[j, io, ii] vol[.., j, .., ii, ..]
    plus cval times each row's missing mass. vol may have a trailing channel
    dim beyond the 3 spatial dims."""
    v = jnp.moveaxis(vol, (batch_axis, axis), (0, 1))  # (J, I, ...rest)
    j, i = v.shape[0], v.shape[1]
    rest = v.shape[2:]
    v2 = v.reshape(j, i, -1)
    out = jnp.einsum("joi,jir->jor", m, v2)
    if cval != 0.0:
        miss = 1.0 - jnp.sum(m, axis=2)               # (J, n_out)
        out = out + cval * miss[:, :, None]
    out = out.reshape(j, m.shape[1], *rest)
    return jnp.moveaxis(out, (0, 1), (batch_axis, axis))


def _rotation_shears(a1, a2, a3):
    """The 9 Paeth shear passes realizing R = Rx(a1) @ Ry(a2) @ Rz(a3) on
    (z, y, x) coordinates. Each planar rotation by theta in the (u, v) plane
    factors as S_u(-tan(theta/2)) S_v(sin theta) S_u(-tan(theta/2)), and each
    shear resamples ONE axis with an offset linear in ONE other axis — a
    batched matmul, no gather. Returns [(axis, batch_axis, coeff), ...] in
    sampling-composition order (first-applied pass = leftmost factor)."""
    passes = []
    # rotation_matrix_3d's rx/rz carry the [[c,-s],[s,c]] block on their
    # planes ((y,x) and (z,y)); ry's (z,x) block is [[c,s],[-s,c]] = a
    # rotation by -theta, hence the sign flip on a2.
    for theta, (u, v) in ((a1, (1, 2)), (-a2, (0, 2)), (a3, (0, 1))):
        t = -jnp.tan(theta / 2.0)
        s = jnp.sin(theta)
        passes += [(u, v, t), (v, u, s), (u, v, t)]
    return passes


def _shear_warp(d, s, a1, a2, a3, sc, in_shape, final_shape, order_seg):
    """Rotation (+ scale) warp as 12 batched-matmul passes (9 shears + 3
    scale resamples) followed by a center crop. Gathers on this TPU backend
    run at ~100 M elem/s (measured), making map_coordinates ~650 ms per
    128^3 sample; the shear path is pure MXU work. The realized geometric map
    is EXACTLY R @ diag(sc); only the interpolation differs (sequential 1-D
    lerps instead of one trilinear, the classical Paeth resampling)."""
    centers = jnp.asarray([(n - 1) / 2.0 for n in in_shape], jnp.float32)

    def centered(n_axis, coeff, batch_axis):
        jj = (jnp.arange(in_shape[batch_axis], dtype=jnp.float32)
              - centers[batch_axis])
        return coeff * jj

    dv, sv = d, s
    all_passes = _rotation_shears(a1, a2, a3)
    for axis, batch_axis, coeff in all_passes:
        off = centered(in_shape[axis], coeff, batch_axis)
        m = _pass_matrix(in_shape[axis], off, 1)
        dv = _apply_axis_pass(dv, m, axis, batch_axis, 0.0)
        ms = m if order_seg != 0 else _pass_matrix(in_shape[axis], off, 0)
        sv = _apply_axis_pass(sv, ms, axis, batch_axis, -1.0)
    # scale passes (rightmost factor of the sampling map -> applied last)
    for axis in range(3):
        mat = _axis_resample_matrix(in_shape[axis], in_shape[axis], sc[axis], 1)
        dv = jnp.moveaxis(
            jnp.tensordot(mat, dv, axes=([1], [axis])), 0, axis)
        ssm = mat if order_seg != 0 else _axis_resample_matrix(
            in_shape[axis], in_shape[axis], sc[axis], 0)
        sv = jnp.moveaxis(
            jnp.tensordot(ssm, sv, axes=([1], [axis])), 0, axis)
        miss = 1.0 - jnp.sum(ssm, axis=1)
        shape = [1, 1, 1]
        shape[axis] = in_shape[axis]
        sv = sv + (-1.0) * miss.reshape(shape)
    off0 = tuple((i - f) // 2 for i, f in zip(in_shape, final_shape))
    fz, fy, fx = final_shape
    dv = jax.lax.dynamic_slice(
        dv, (*off0, 0), (fz, fy, fx, dv.shape[-1]))
    sv = jax.lax.dynamic_slice(sv, off0, (fz, fy, fx))
    if order_seg != 0:
        sv = jnp.round(sv)
    return dv, sv


def _use_shear_warp() -> bool:
    import os
    return os.environ.get("MTTPU_SHEAR_WARP", "1") != "0"


@partial(jax.jit, static_argnames=("final_shape", "order_seg", "dummy_2d",
                                   "independent_scale", "rot_p_per_axis"))
def spatial_augment(rng, data, seg, final_shape, scale_range=(0.7, 1.4),
                    rot_x=(-0.5236, 0.5236), rot_y=(-0.5236, 0.5236),
                    rot_z=(-0.5236, 0.5236), p_rot=0.2, p_scale=0.2,
                    order_seg=1, dummy_2d=False, rot_p_per_axis=1.0,
                    independent_scale=False):
    """data (B, Z', Y', X', C) float; seg (B, Z', Y', X') float (labels, -1 border).
    Returns (data_out (B, *final_shape, C), seg_out (B, *final_shape)).

    Per-sample three-way branch (lax.switch under lax.map), mirroring
    batchgenerators' augment_spatial control flow — when neither rotation nor
    scaling fires the reference CENTER-CROPS without interpolating, so the
    expensive warp only runs for the p_rot fraction of samples:
      0. no rot, no scale  -> static center crop (a slice; ~64% of samples)
      1. scale only        -> separable matmul resample (MXU, no gather)
      2. rotation (+scale) -> trilinear map_coordinates gather (the only
         non-separable case; ~p_rot of samples)
    Measured on v5e at b2 128^3: the always-gather formulation costs ~1.3 s;
    the branched one ~0.2 x that on average.

    `rot_p_per_axis` < 1 keeps each axis' rotation angle only with that
    probability (SpatialTransform p_rot_per_axis); `independent_scale` samples
    one zoom factor per spatial axis (independent_scale_factor_for_each_axis)."""
    b = data.shape[0]
    in_shape = data.shape[1:4]
    k_rot, k_scale, k_angles = jax.random.split(rng, 3)

    do_rot = jax.random.uniform(k_rot, (b,)) < p_rot
    do_scale = jax.random.uniform(k_scale, (b,)) < p_scale
    ka_x, ka_y, ka_z, k_s = jax.random.split(k_angles, 4)
    ax = jax.random.uniform(ka_x, (b,), minval=rot_x[0], maxval=rot_x[1])
    ay = jax.random.uniform(ka_y, (b,), minval=rot_y[0], maxval=rot_y[1])
    az = jax.random.uniform(ka_z, (b,), minval=rot_z[0], maxval=rot_z[1])
    if rot_p_per_axis < 1.0:
        k_pax = jax.random.fold_in(ka_x, 17)
        keep = jax.random.uniform(k_pax, (b, 3)) < rot_p_per_axis
        ax = jnp.where(keep[:, 0], ax, 0.0)
        ay = jnp.where(keep[:, 1], ay, 0.0)
        az = jnp.where(keep[:, 2], az, 0.0)
    if dummy_2d:
        # in-plane rotation only: rotate about the z (first) axis
        ay = jnp.zeros_like(ay)
        az = jnp.zeros_like(az)
    ax = jnp.where(do_rot, ax, 0.0)
    ay = jnp.where(do_rot, ay, 0.0)
    az = jnp.where(do_rot, az, 0.0)
    # batchgenerators samples zoom-in (<1) and zoom-out (>1) with equal probability
    k_s1, k_s2, k_s3 = jax.random.split(k_s, 3)
    axes = 3 if independent_scale else 1
    lo = jax.random.uniform(k_s1, (b, axes), minval=scale_range[0], maxval=1.0)
    hi = jax.random.uniform(k_s2, (b, axes), minval=1.0, maxval=scale_range[1])
    pick_lo = jax.random.uniform(k_s3, (b, axes)) < 0.5
    scale = jnp.where(pick_lo, lo, hi)
    scale = jnp.where(do_scale[:, None], scale, 1.0)
    scale = jnp.broadcast_to(scale, (b, 3))

    grid = _centered_grid(final_shape)  # (3, N)
    center_in = jnp.array([(s - 1) / 2.0 for s in in_shape], jnp.float32)
    crop_off = tuple((i - f) // 2 for i, f in zip(in_shape, final_shape))

    def crop_one(d, s, a1, a2, a3, sc):
        dz, dy, dx = crop_off
        fz, fy, fx = final_shape
        d_out = jax.lax.dynamic_slice(
            d, (dz, dy, dx, 0), (fz, fy, fx, d.shape[-1]))
        s_out = jax.lax.dynamic_slice(s, (dz, dy, dx), (fz, fy, fx))
        return d_out, s_out

    def scale_one(d, s, a1, a2, a3, sc):
        return _scale_resample(d, s, sc, in_shape, final_shape, order_seg)

    use_shear = _use_shear_warp()

    def warp_one(d, s, a1, a2, a3, sc):
        if use_shear:
            return _shear_warp(d, s, a1, a2, a3, sc, in_shape, final_shape,
                               order_seg)
        r = rotation_matrix_3d(a1, a2, a3)
        coords = (r @ (grid * sc[:, None])) + center_in[:, None]
        d_out = jax.vmap(lambda v: _warp_volume(v, coords, 1, 0.0), in_axes=-1,
                         out_axes=-1)(d)
        s_out = _warp_volume(s, coords, order_seg, -1.0)
        if order_seg != 0:
            s_out = jnp.round(s_out)
        return (d_out.reshape(final_shape + (d.shape[-1],)),
                s_out.reshape(final_shape))

    branch = jnp.where(do_rot, 2, jnp.where(do_scale, 1, 0)).astype(jnp.int32)

    def per_sample(args):
        d, s, idx, a1, a2, a3, sc = args
        return jax.lax.switch(
            idx,
            [lambda op: crop_one(*op), lambda op: scale_one(*op),
             lambda op: warp_one(*op)],
            (d, s, a1, a2, a3, sc))

    data_out, seg_out = jax.lax.map(
        per_sample, (data, seg, branch, ax, ay, az, scale))
    return data_out, seg_out


def mirror_augment(rng, data, seg, mirror_axes=(0, 1, 2)):
    """Random flips along spatial axes, p=0.5 each, jointly on data+seg
    (MirrorTransform parity). data (B, Z, Y, X, C), seg (B, Z, Y, X)."""
    b = data.shape[0]
    keys = jax.random.split(rng, len(mirror_axes))
    for ki, ax in zip(keys, mirror_axes):
        flip = jax.random.uniform(ki, (b,)) < 0.5
        axis = ax + 1  # batch offset
        data = jnp.where(flip.reshape((b,) + (1,) * (data.ndim - 1)),
                         jnp.flip(data, axis=axis), data)
        seg = jnp.where(flip.reshape((b,) + (1,) * (seg.ndim - 1)),
                        jnp.flip(seg, axis=axis), seg)
    return data, seg


def downsample_seg_for_ds(seg, ds_scales):
    """Nearest-downsampled label targets per deep-supervision level.
    seg (B, *spatial); scales are 1/2^k per axis so strided slicing is exact
    nearest sampling (DownsampleSegForDSTransform2 role)."""
    out = []
    for scale in ds_scales:
        strides = [int(round(1.0 / s)) for s in scale]
        sl = (slice(None),) + tuple(slice(None, None, s) for s in strides)
        out.append(seg[sl])
    return out


@partial(jax.jit, static_argnames=("final_shape", "order_seg"))
def spatial_augment_2d(rng, data, seg, final_shape, scale_range=(0.7, 1.4),
                       rot=(-3.1416, 3.1416), p_rot=0.2, p_scale=0.2,
                       order_seg=1):
    """2D counterpart of spatial_augment: data (B, Y', X', C), seg (B, Y', X');
    single in-plane rotation angle (default_2D_augmentation_params uses
    rotation_x as the in-plane range)."""
    b = data.shape[0]
    in_shape = data.shape[1:3]
    k_rot, k_scale, k_angle, k_s = jax.random.split(rng, 4)
    do_rot = jax.random.uniform(k_rot, (b,)) < p_rot
    do_scale = jax.random.uniform(k_scale, (b,)) < p_scale
    a = jax.random.uniform(k_angle, (b,), minval=rot[0], maxval=rot[1])
    a = jnp.where(do_rot, a, 0.0)
    k_s1, k_s2, k_s3 = jax.random.split(k_s, 3)
    lo = jax.random.uniform(k_s1, (b,), minval=scale_range[0], maxval=1.0)
    hi = jax.random.uniform(k_s2, (b,), minval=1.0, maxval=scale_range[1])
    scale = jnp.where(jax.random.uniform(k_s3, (b,)) < 0.5, lo, hi)
    scale = jnp.where(do_scale, scale, 1.0)

    axes = [jnp.arange(s, dtype=jnp.float32) - (s - 1) / 2.0 for s in final_shape]
    yy, xx = jnp.meshgrid(*axes, indexing="ij")
    grid = jnp.stack([yy.ravel(), xx.ravel()])  # (2, N)
    center_in = jnp.array([(s - 1) / 2.0 for s in in_shape], jnp.float32)

    def warp_one(d, s_map, ang, sc):
        c, sn = jnp.cos(ang), jnp.sin(ang)
        r = jnp.array([[c, -sn], [sn, c]])
        coords = (r @ (grid * sc)) + center_in[:, None]
        d_out = jax.vmap(
            lambda v: jax.scipy.ndimage.map_coordinates(
                v, [coords[0], coords[1]], order=1, mode="constant", cval=0.0),
            in_axes=-1, out_axes=-1)(d)
        s_out = jax.scipy.ndimage.map_coordinates(
            s_map, [coords[0], coords[1]], order=order_seg, mode="constant",
            cval=-1.0)
        if order_seg != 0:
            s_out = jnp.round(s_out)
        return (d_out.reshape(final_shape + (d.shape[-1],)),
                s_out.reshape(final_shape))

    return jax.vmap(warp_one)(data, seg, a, scale)
