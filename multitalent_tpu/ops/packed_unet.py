"""Packed-execution forward pass for GenericUNet: same params, MXU-shaped compute.

Executes a GenericUNet forward pass from the standard flax params pytree, but
runs the small-channel high-resolution stages in space-to-depth packed (y,x)
layout (ops/packed_conv.py). The parameters, outputs, and numerics match
`GenericUNet.apply` (bf16-exact up to reduction order); only the schedule of
the compute changes: C=30 convolutions become C=120 convolutions on a quarter
of the voxels (factors (2,2)) and C=60 convolutions become C=120 on half the
voxels (factors (1,2)), lifting MXU utilization from ~(C/128)^2 toward the
~128-lane ceiling.

Used by the sliding-window inference engine (the bench-critical path) and the
jitted train/eval steps. The reference has no analog — this is a TPU-specific
execution strategy for the architecture at generic_UNet.py:156-401.

Packing policy (`stage_factors`): per resolution stage, the largest per-axis
factors (fy, fx) in {1,2}x{1,2} such that fy*fx*C_d <= pack_max_channels,
provided every pooling transition the stage spans is (sz, 2, 2) with sz in
{1, 2} and the stage's y/x extents divide. v5e flagship measurements (base 30,
patch 96x192x192): stage0 (2,2)-packed gives fwd 245.9 -> 116.3 ms/sample (b2)
and train fwd+bwd 495.6 -> 241.7 ms (b1); the default pack_max_channels=128
additionally runs the C=60 stage (1,2)-packed.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from multitalent_tpu.models.generic_unet import GenericUNet, compute_stage_features
from multitalent_tpu.ops import packed_conv as pc

UNPACKED = (1, 1)


def _conv_same(x, w, b=None, strides=(1, 1, 1), dtype=jnp.bfloat16,
               pads=None):
    # Interior (C >= 120) stride-1 3^3 convs ride the Pallas tap-GEMM kernel:
    # measured per-stage at b4 it beats XLA everywhere (enc2 86 vs 73, enc3 63
    # vs 56, dec2 60 vs 46, dec1 41 vs 36 TFLOP/s). Channels below 120 stay on
    # XLA — the 128-lane padding inflates FLOPs by (128/C)^2 and loses.
    # (An earlier b2 measurement concluded the opposite; superseded.)
    if (strides == (1, 1, 1) and w.shape[:3] == (3, 3, 3)
            and w.shape[3] >= 120 and pads is None):
        from multitalent_tpu.ops.pallas_conv import (conv3d_same_fast,
                                                     pallas_conv_enabled)
        if pallas_conv_enabled():
            out = conv3d_same_fast(x.astype(dtype), w.astype(dtype))
            if b is not None:
                out = out + b.astype(dtype)
            return out
    pad = (tuple(((k - 1) // 2, (k - 1) // 2) for k in w.shape[:3])
           if pads is None else tuple(pads))
    out = lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), tuple(strides), pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if b is not None:
        out = out + b.astype(dtype)
    return out


def _instance_norm_lrelu(x, scale, bias, negative_slope=1e-2, eps=1e-5):
    xf = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps) * scale + bias
    # cast before the activation, matching InstanceNorm -> leaky_relu in blocks.py
    y = y.astype(x.dtype)
    return pc._leaky_relu(y, negative_slope)


def _block(x, p, *, strides=(1, 1, 1), negative_slope, dtype,
           factors=UNPACKED, in_groups=None, pads=None, sparse=False,
           prepared=None):
    """One ConvNormAct block (conv + bias -> InstanceNorm -> LeakyReLU).
    `prepared`: packed-conv weights precomputed outside a tile loop
    (prepare_packed_conv3d output)."""
    w, b = p["conv"]["kernel"], p["conv"]["bias"]
    ns, nb = p["norm"]["scale"], p["norm"]["bias"]
    if factors != UNPACKED:
        assert strides == (1, 1, 1)
        if prepared is not None:
            out = pc.apply_packed_conv3d(x.astype(dtype), prepared)
        else:
            out = pc.packed_conv3d(x.astype(dtype), w.astype(dtype),
                                   factors=factors, in_groups=in_groups,
                                   sparse=sparse)
        out = out + jnp.tile(b.astype(dtype), pc.nphases(factors))
        return pc.packed_instance_norm(out, ns, nb, factors=factors,
                                       negative_slope=negative_slope)
    out = _conv_same(x, w, b, strides, dtype, pads=pads)
    return _instance_norm_lrelu(out, ns, nb, negative_slope)


def stage_factors(model: GenericUNet, patch_size: Sequence[int],
                  pack_max_channels: int = 128) -> list[tuple[int, int]]:
    """Per-encoder-stage packing factors (fy, fx); (1,1) = unpacked. Packed
    stages form a leading prefix (channel widths grow monotonically)."""
    num_pool = model.num_pool
    if len(patch_size) != 3:
        return [UNPACKED] * num_pool
    feats = compute_stage_features(model.base_num_features, num_pool + 1,
                                   model.max_num_features)
    out: list[tuple[int, int]] = []
    y, x = patch_size[1], patch_size[2]
    prefix_alive = True
    for d in range(num_pool):
        pool = tuple(model.pool_op_kernel_sizes[d])
        total = 1
        while total < 4 and feats[d] * total * 2 <= pack_max_channels:
            total *= 2
        fy, fx = {1: (1, 1), 2: (1, 2), 4: (2, 2)}[total]
        ok = (prefix_alive and (fy, fx) != UNPACKED
              and pool[1:] == (2, 2) and pool[0] in (1, 2)
              and y % (2 if fy == 2 else 1) == 0 and x % 2 == 0)
        if ok:
            out.append((fy, fx))
        else:
            out.append(UNPACKED)
            prefix_alive = False
        y //= pool[1]
        x //= pool[2]
    return out


def _block2(pair, p, prepared, *, negative_slope, dtype, factors):
    """ConvNormAct block over an unconcatenated (up, skip) pair via the
    two-input merged-tap kernel (prepare_merged2 output)."""
    from multitalent_tpu.ops.pallas_merged_conv import (
        pallas_packed_conv3d_merged2)
    a, b_in = pair
    out = pallas_packed_conv3d_merged2(a.astype(dtype), b_in.astype(dtype),
                                       prepared)
    out = out + jnp.tile(p["conv"]["bias"].astype(dtype),
                         pc.nphases(factors))
    return pc.packed_instance_norm(out, p["norm"]["scale"],
                                   p["norm"]["bias"], factors=factors,
                                   negative_slope=negative_slope)


def packable_stages(model: GenericUNet, patch_size: Sequence[int],
                    pack_max_channels: int = 128) -> int:
    """Number of leading resolution stages that run packed (0 = fully unpacked)."""
    return sum(1 for f in stage_factors(model, patch_size, pack_max_channels)
               if f != UNPACKED)


def _flip_conv_kernels(params, axes, cast_to=None):
    """Tap-reverse every 5-D conv kernel on the given spatial axes (0=z, 1=y,
    2=x). In a GenericUNet params tree the 5-D leaves are exactly the conv /
    transposed-conv / seg-head kernels (kz, ky, kx, Cin, Cout); 1x1x1 heads
    flip to themselves. Weights are tiny next to activations, so re-deriving
    the 8 mirror variants inside jit costs ~nothing while removing every
    activation flip from the TTA loop.

    IMPORTANT: callers inside a device tile loop must run this in a PREPARE
    step outside the loop body (prepare_flipped_params), not per combo inside
    it — the optimization_barrier below is opaque to XLA's loop-invariant
    code motion, so everything downstream of it (notably the packed-weight
    scatter builds, ~6 ms/iteration kLoop fusions) gets re-executed every
    loop iteration when the barrier sits in the body (measured ~2.5 s of a
    19 s volume, xprof round 4).

    cast_to: also cast the 5-D leaves (the conv kernels) to this dtype — the
    blocks cast to the model dtype anyway, and casting in prepare halves the
    resident size of the 8 mirror variants."""
    axes = [int(a) for a in axes]

    def leaf(v):
        if getattr(v, "ndim", 0) != 5:
            return v
        if axes:
            v = jnp.flip(v, axes)
        return v.astype(cast_to) if cast_to is not None else v

    if not axes and cast_to is None:
        return params
    flipped = jax.tree_util.tree_map(leaf, params)
    if not axes:
        return flipped
    # Barrier: without it XLA folds the kernel lax.rev into the conv's
    # window_reversal, and the TPU fusion emitter then trips a
    # `window.pad_low[i] == 0` CHECK (observed -2) when that combines with
    # the asymmetric flipped-world pads. Materializing the flipped kernels
    # (a few MB, once per combo per program) sidesteps the miscompile.
    return jax.lax.optimization_barrier(flipped)


def _packout_enabled() -> bool:
    """Packed-output strided conv (next stage's packing baked into the
    weight). MTTPU_PACKOUT_STRIDED=0 bisects back to unpack-then-repack."""
    import os
    return os.environ.get("MTTPU_PACKOUT_STRIDED", "1") != "0"


def _merged2_qualifies(factors, groups, x_shape) -> bool:
    """Gate for the two-input merged decoder conv: same adjudication as the
    single-input merged kernel ((2,2), each half one K tile, block grid
    fits, TPU backend, MTTPU_PALLAS_MERGED not disabled)."""
    import jax as _jax
    from multitalent_tpu.ops import pallas_merged_conv as pmc
    from multitalent_tpu.ops.pallas_conv import _pick_blocks
    if (groups is None or len(groups) != 2
            or tuple(factors) != (2, 2)
            or not pmc.merged_conv_enabled()
            or _jax.default_backend() != "tpu"):
        return False
    p = int(factors[0]) * int(factors[1])
    if p * int(groups[0]) > 128 or p * int(groups[1]) > 128:
        return False
    return _pick_blocks(int(x_shape[1]), int(x_shape[2]),
                        int(x_shape[3])) is not None


def prepare_packed_unet_weights(model: GenericUNet, params, x_shape, *,
                                pack_max_channels: int = 128,
                                flip_combo: tuple[int, ...] = (),
                                sparse: bool = False):
    """Materialize every weight-derived array packed_unet_forward needs for
    inputs of `x_shape` — packed conv weights (scatter builds), strided /
    transposed kernels, the head's block-diagonal matrix.

    MUST be computed outside a device tile loop: left inline, the builds
    compile to kLoop fusions that XLA re-executes every loop iteration (2.5-3
    s of a 19 s bench volume, xprof round 4 — XLA's while passes sink rather
    than hoist them, and the TTA flip barrier blocks hoisting anyway).

    `params` must already be tap-reversed for `flip_combo`
    (_flip_conv_kernels); flip_combo here only drives the strided-conv
    padding geometry. Returns None when the input isn't packable. The walk
    mirrors packed_unet_forward's structure exactly; the flipw equivalence
    tests pin the two together."""
    num_pool = model.num_pool
    dtype = model.dtype
    flip_combo = tuple(int(a) for a in flip_combo)
    sfactors = stage_factors(model, x_shape[1:4], pack_max_channels)
    if all(f == UNPACKED for f in sfactors):
        return None
    prep: dict = {}
    z, y, x = (int(v) for v in x_shape[1:4])
    cur = sfactors[0]

    def conv_xshape(cin):
        return (1, z, y // cur[0], x // cur[1], pc.nphases(cur) * cin)

    for d in range(num_pool + 1):
        name = "bottleneck" if d == num_pool else f"enc{d}"
        p = params[name]
        stride = tuple(model.pool_op_kernel_sizes[d - 1]) if d > 0 else (1, 1, 1)
        nxt = sfactors[d] if d < num_pool else UNPACKED
        for i in range(model.conv_per_stage):
            w = p[f"block{i}"]["conv"]["kernel"]
            if i == 0 and d > 0:
                if cur != UNPACKED:
                    prep[f"{name}.strided"] = pc.prepare_packed_strided_conv3d(
                        w.astype(dtype), conv_xshape(w.shape[3]),
                        z_stride=stride[0], factors=cur, flip=flip_combo,
                        out_factors=nxt if (nxt != UNPACKED
                                            and _packout_enabled()) else None)
                    z, y, x = z // stride[0], y // 2, x // 2
                    cur = nxt
                else:
                    z, y, x = z // stride[0], y // stride[1], x // stride[2]
            elif cur != UNPACKED:
                prep[f"{name}.block{i}"] = pc.prepare_packed_conv3d(
                    w.astype(dtype), conv_xshape(w.shape[3]), factors=cur,
                    sparse=sparse)

    for u in range(num_pool):
        s_idx = num_pool - 1 - u
        target = sfactors[s_idx]
        stride = tuple(model.pool_op_kernel_sizes[s_idx])
        wt = params[f"up{u}"]["kernel"]
        z, y, x = z * stride[0], y * stride[1], x * stride[2]
        if target != UNPACKED:
            prep[f"up{u}"] = pc.prepare_packed_conv_transpose3d(
                wt.astype(dtype), z_stride=stride[0], factors=target)
            cur = target
            skip_c = params[f"enc{s_idx}"][
                f"block{model.conv_per_stage - 1}"]["conv"]["kernel"].shape[4]
            groups = (wt.shape[4], skip_c)
        else:
            cur = UNPACKED
            groups = None
        for i in range(model.conv_per_stage):
            w = params[f"dec{u}"][f"block{i}"]["conv"]["kernel"]
            if cur != UNPACKED:
                if i == 0 and sparse and _merged2_qualifies(
                        cur, groups, conv_xshape(w.shape[3])):
                    # two-input merged-tap conv on the (up, skip) pair: the
                    # forward skips the concat entirely (see decoder loop)
                    from multitalent_tpu.ops import pallas_merged_conv as pmc
                    prep[f"dec{u}.block{i}"] = {
                        "kind": "merged2",
                        "prep": pmc.prepare_merged2(w.astype(dtype), cur,
                                                    groups)}
                    continue
                prep[f"dec{u}.block{i}"] = pc.prepare_packed_conv3d(
                    w.astype(dtype), conv_xshape(w.shape[3]), factors=cur,
                    in_groups=groups if i == 0 else None, sparse=sparse)
        if u == num_pool - 1 and cur != UNPACKED:
            hw = params[f"seg{u}"]["kernel"]
            prep[f"seg{u}"] = pc.prepare_packed_pointwise_conv3d(
                hw.astype(dtype), cur)
    return prep


def packed_unet_forward(model: GenericUNet, params, x, *,
                        deep_supervision: bool = False,
                        pack_max_channels: int = 128,
                        packed_output: bool = False,
                        flip_combo: tuple[int, ...] = (),
                        sparse: bool = False,
                        preflipped: bool = False,
                        prep: dict | None = None):
    """Forward pass equal to model.apply({'params': params}, x,
    deep_supervision=...) but with the leading stages executed packed.

    x: (N, Z, Y, X, C_in) float array. Returns full-res logits (fp32) or the
    deep-supervision list, highest resolution first.

    packed_output=True (inference only): the final seg-head logits are
    returned still in the stage-0 packed layout (N, Z, Y/fy, X/fx, P*K),
    phase-major — skipping the full-resolution depth-to-space, the single
    largest layout copy of the forward (~14 ms per b2 flagship forward on
    v5e). The sliding-window engine accumulates in packed space and performs
    one depth-to-space per VOLUME at finalize instead of one per tile.

    flip_combo: static subset of spatial axes (0=z, 1=y, 2=x) for mirror-TTA
    executed IN THE WEIGHTS: returns flip(net(flip(x))) on those axes while
    never flipping an activation — conv kernels are tap-reversed and strided
    convs use the mirrored asymmetric padding (flipped_strided_pads). The
    per-tile unflip of full-res probabilities this replaces cost ~1.5 s/volume
    of lax.rev traffic on v5e (xprof, 8x TTA). Exact: the flip equivariance of
    conv/norm/pointwise ops is algebraic, not approximate."""
    num_pool = model.num_pool
    dtype = model.dtype
    slope = model.negative_slope
    flip_combo = tuple(int(a) for a in flip_combo)
    sfactors = stage_factors(model, x.shape[1:4], pack_max_channels)
    if all(f == UNPACKED for f in sfactors):
        if flip_combo:
            raise ValueError("flip_combo requires the packed execution path")
        out = model.apply({"params": params}, x,
                          deep_supervision=deep_supervision)
        return (out, UNPACKED) if packed_output else out

    if not preflipped:
        params = _flip_conv_kernels(params, flip_combo)
    # preflipped: params arrived tap-reversed from prepare_flipped_params
    # (hoisted out of the caller's tile loop); flip_combo still selects the
    # mirrored strided-conv padding below.

    def strided_pads(shape_zyx, kernel, strides):
        """Per-axis explicit pads for an unpacked strided conv under
        flip_combo (None = torch-SAME symmetric everywhere)."""
        if not flip_combo:
            return None
        pads = []
        for a in range(3):
            k, s, L = kernel[a], strides[a], shape_zyx[a]
            if a in flip_combo:
                pads.append(pc.flipped_strided_pads(L, k, s))
            else:
                pads.append(((k - 1) // 2, k - 1 - (k - 1) // 2))
        return tuple(pads)

    x = x.astype(dtype)
    cur = sfactors[0]
    x = pc.space_to_depth_yx(x, cur)

    # ---- encoder ----------------------------------------------------------
    skips = []
    for d in range(num_pool + 1):
        name = "bottleneck" if d == num_pool else f"enc{d}"
        p = params[name]
        stride = tuple(model.pool_op_kernel_sizes[d - 1]) if d > 0 else (1, 1, 1)
        nxt = sfactors[d] if d < num_pool else UNPACKED
        for i in range(model.conv_per_stage):
            bp = p[f"block{i}"]
            if i == 0 and d > 0:
                if cur != UNPACKED:
                    # strided conv consumes the packing; when the next stage
                    # is packed too, it also PRODUCES that packing (output
                    # phases baked into the weight — N fill 60->120 lanes on
                    # the stage0->1 flagship site, and no separate repack).
                    # MTTPU_PACKOUT_STRIDED=0 bisects back to the
                    # unpack-then-repack formulation.
                    packout = (nxt != UNPACKED and _packout_enabled())
                    w, b = bp["conv"]["kernel"], bp["conv"]["bias"]
                    out = pc.packed_strided_conv3d(
                        x.astype(dtype), w.astype(dtype), z_stride=stride[0],
                        factors=cur, flip=flip_combo,
                        out_factors=nxt if packout else None,
                        prepared=prep.get(f"{name}.strided")
                        if prep else None)
                    if nxt != UNPACKED:
                        if packout:
                            out = out + jnp.tile(b.astype(dtype),
                                                 pc.nphases(nxt))
                        else:
                            out = pc.space_to_depth_yx(out + b.astype(dtype),
                                                       nxt)
                        x = pc.packed_instance_norm(
                            out, bp["norm"]["scale"], bp["norm"]["bias"],
                            factors=nxt, negative_slope=slope)
                    else:
                        out = out + b.astype(dtype)
                        x = _instance_norm_lrelu(
                            out, bp["norm"]["scale"], bp["norm"]["bias"], slope)
                    cur = nxt
                else:
                    x = _block(x, bp, strides=stride, negative_slope=slope,
                               dtype=dtype,
                               pads=strided_pads(
                                   x.shape[1:4],
                                   bp["conv"]["kernel"].shape[:3], stride))
            else:
                x = _block(x, bp, negative_slope=slope, dtype=dtype,
                           factors=cur, sparse=sparse,
                           prepared=prep.get(f"{name}.block{i}")
                           if prep else None)
        if d < num_pool:
            skips.append(x)

    # ---- decoder ----------------------------------------------------------
    seg_outputs = []
    for u in range(num_pool):
        s_idx = num_pool - 1 - u
        skip = skips[s_idx]
        target = sfactors[s_idx]
        stride = tuple(model.pool_op_kernel_sizes[s_idx])
        wt = params[f"up{u}"]["kernel"]
        if target != UNPACKED:
            if cur != UNPACKED:
                x = pc.depth_to_space_yx(x, cur)
            x = pc.packed_conv_transpose3d(x.astype(dtype), wt.astype(dtype),
                                           z_stride=stride[0], factors=target,
                                           prepared=prep.get(f"up{u}")
                                           if prep else None)
            cur = target
            # PLAIN concat [P*c_up | P*c_skip]: the phase regrouping moves
            # into the first decoder conv's packed weight (in_groups below) —
            # a 6-D reshape here materialized a full-tensor copy (~3 ms per
            # b2 flagship forward on v5e, xprof)
            ph = pc.nphases(target)
            groups = (x.shape[-1] // ph, skip.shape[-1] // ph)
            p0 = prep.get(f"dec{u}.block0") if prep else None
            if p0 is not None and p0.get("kind") == "merged2":
                # two-input merged-tap conv consumes the (up, skip) pair
                # directly — the concat tensor is never materialized
                x = _block2((x, skip), params[f"dec{u}"]["block0"],
                            p0["prep"], negative_slope=slope, dtype=dtype,
                            factors=cur)
                start = 1
            else:
                x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
                start = 0
        else:
            assert cur == UNPACKED
            x = lax.conv_transpose(
                x.astype(dtype), wt.astype(dtype), strides=stride,
                padding="VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            groups = None
            start = 0
        for i in range(start, model.conv_per_stage):
            x = _block(x, params[f"dec{u}"][f"block{i}"], negative_slope=slope,
                       dtype=dtype, factors=cur,
                       in_groups=groups if (i == 0 and cur != UNPACKED)
                       else None, sparse=sparse,
                       prepared=prep.get(f"dec{u}.block{i}")
                       if prep else None)
        # seg head
        if deep_supervision or u == num_pool - 1:
            hp = params[f"seg{u}"]
            hw = hp["kernel"]
            hb = hp.get("bias") if model.seg_output_bias else None
            if cur != UNPACKED:
                logits = None
                if packed_output and not deep_supervision:
                    # caller accumulates in packed space; no d2s at all.
                    # Logits stay in the model dtype: the consumer
                    # (sliding_window._chunk_contrib) casts to f32 inside its
                    # sigmoid fusion — a standalone f32 convert here
                    # materializes an extra full-size copy (~5.5 ms per b2
                    # forward on v5e, xprof)
                    logits = pc.packed_pointwise_conv3d(
                        x.astype(dtype), hw.astype(dtype),
                        jnp.tile(hb.astype(dtype), pc.nphases(cur))
                        if hb is not None else None, factors=cur,
                        prepared=prep.get(f"seg{u}") if prep else None)
                    return logits, cur
                if not deep_supervision:
                    # inference: fused GEMM + depth-to-space kernel keeps the
                    # packed head result out of HBM (saves ~14 ms of layout
                    # copies per b2 forward on v5e, measured by xprof)
                    from multitalent_tpu.ops.pallas_seghead import (
                        seghead_d2s, seghead_enabled)
                    if seghead_enabled():
                        try:
                            logits = seghead_d2s(
                                x.astype(dtype), hw,
                                hb.astype(jnp.float32)
                                if hb is not None else None, factors=cur)
                        except ValueError:
                            logits = None
                if logits is None:
                    logits = pc.packed_pointwise_conv3d(
                        x.astype(dtype), hw.astype(dtype),
                        jnp.tile(hb.astype(dtype), pc.nphases(cur))
                        if hb is not None else None, factors=cur,
                        prepared=prep.get(f"seg{u}") if prep else None)
                    logits = pc.depth_to_space_yx(logits, cur)
            else:
                logits = _conv_same(x, hw, hb, dtype=dtype)
                if packed_output and not deep_supervision:
                    return logits, UNPACKED
            seg_outputs.append(logits.astype(jnp.float32))

    if deep_supervision:
        return seg_outputs[::-1]
    return seg_outputs[-1]


def make_packed_inference_apply_fn(model, patch_size):
    """(apply_fn, factors) for packed-space sliding-window accumulation.

    apply_fn(params, batch) returns the final seg-head logits still in the
    stage-0 packed layout (N, Z, Y/fy, X/fx, P*K), phase-major, for inputs of
    exactly `patch_size`; `factors` are the (fy, fx) the caller must use to
    interpret them. Returns (None, UNPACKED) when packed execution doesn't
    apply to this model/patch — callers fall back to
    make_inference_apply_fn."""
    import os
    packable = (isinstance(model, GenericUNet)
                and model.norm == "instance"
                and model.nonlin == "leaky_relu"
                and model.dropout_rate == 0.0
                and _packed_enabled("MTTPU_PACKED_CONV"))
    if not packable:
        return None, UNPACKED
    pmc = int(os.environ.get("MTTPU_PACK_MAX_CHANNELS", "128"))
    factors = stage_factors(model, tuple(int(p) for p in patch_size), pmc)[0]
    if factors == UNPACKED:
        return None, UNPACKED

    fuse = os.environ.get("MTTPU_FUSED_NORM") == "1"

    def apply_fn(state, batch, flip=(), preflipped=False):
        if preflipped:
            params, prep = state  # from prepare_flipped
        else:
            params, prep = state, None
        if fuse and not flip:
            try:
                out, f = packed_unet_forward_fused(model, params, batch,
                                                   pack_max_channels=pmc,
                                                   packed_output=True)
                assert f == factors, (f, factors)
                return out
            except ValueError:
                pass  # shape outside the kernels' block grid
        out, f = packed_unet_forward(model, params, batch,
                                     deep_supervision=False,
                                     pack_max_channels=pmc,
                                     packed_output=True,
                                     flip_combo=tuple(flip),
                                     sparse=True,
                                     preflipped=preflipped,
                                     prep=prep)
        assert f == factors, (f, factors)
        return out

    def prepare_flipped(params, combos):
        """Per-combo (tap-reversed params, prepared packed weights), to be
        computed ONCE outside a tile loop: the flip's optimization_barrier
        blocks XLA's loop-invariant code motion — and XLA's while passes SINK
        the packed-weight scatter builds into the body regardless, where they
        re-execute every iteration (~2.5-3 s of a 19 s bench volume, xprof
        round 4). prepare_packed_unet_weights materializes them as real
        arrays the loop merely consumes."""
        x_shape = (1, *[int(p_) for p_ in patch_size],
                   int(model.input_channels))
        out = {}
        for c in combos:
            c = tuple(c)
            flipped = _flip_conv_kernels(params, c, cast_to=model.dtype)
            out[c] = (flipped, prepare_packed_unet_weights(
                model, flipped, x_shape, pack_max_channels=pmc,
                flip_combo=c, sparse=True))
        return out

    # mirror TTA can run in the weights (tap-reversed kernels + mirrored
    # strided-conv padding) instead of flipping activations: the sliding-
    # window engine checks this flag to pick the flip-free accumulation path
    apply_fn.supports_weight_flip = True
    apply_fn.prepare_flipped = prepare_flipped
    return apply_fn, factors


def packed_unet_forward_fused(model: GenericUNet, params, x, *,
                              pack_max_channels: int = 128,
                              deep_supervision: bool = False,
                              differentiable: bool = False,
                              interpret: bool = False,
                              packed_output: bool = False):
    """Forward equal to packed_unet_forward with the
    conv->InstanceNorm->LeakyReLU chains fused into the Pallas conv kernel
    (pallas_conv3d_same_affine): each stride-1 conv consumes the previous
    conv's RAW output, applying its normalize+activation in the kernel
    prologue, and emits channel stats so the next norm needs no reduction
    pass. Post-norm activations are materialized only where a non-conv
    consumer needs them (skips/concats, strided and transposed convs, the seg
    heads). With differentiable=True the blocks run through
    conv3d_same_affine_fast (custom VJP: backward recomputes the elementwise
    normalize and rides the Pallas dx/wgrad kernels) so jax.grad works — the
    training path. Raises ValueError when the input isn't packable (callers
    fall back to packed_unet_forward); per-block shape misfits fall back to
    XLA convs internally."""
    from multitalent_tpu.ops.pallas_conv import (conv3d_same_affine_fast,
                                                 pallas_conv3d_same_affine)
    from multitalent_tpu.ops.pallas_seghead import seghead_d2s

    num_pool = model.num_pool
    dtype = model.dtype
    slope = model.negative_slope
    sfactors = stage_factors(model, x.shape[1:4], pack_max_channels)
    if all(f == UNPACKED for f in sfactors):
        # unpackable input: the small-channel full-res stages would waste the
        # 128-lane kernels; let the caller fall back to packed_unet_forward
        # (which itself falls back to model.apply)
        raise ValueError("input not packable")

    def fused_block(raw_in, bp, affine, factors):
        """One conv block on the Pallas kernel: prologue applies `affine`
        (None for an already-normalized input), returns (raw_out, stats).
        Shapes the kernel's block grid can't tile (the deepest stages, spatial
        extent < 8) fall back to the XLA affine + conv — negligible FLOPs."""
        w, b = bp["conv"]["kernel"], bp["conv"]["bias"]
        if factors != UNPACKED:
            w = pc.pack_conv_weights(w.astype(dtype), factors)
            b = jnp.tile(b, pc.nphases(factors))
        if w.shape[:3] != (3, 3, 3):
            raise ValueError("fused path requires 3x3x3 convs")
        sc, sh = affine if affine is not None else (None, None)
        if differentiable:
            # custom-VJP wrapper: Pallas forward when the shape/threshold
            # qualify, XLA composition otherwise; grads flow through stats
            return conv3d_same_affine_fast(
                raw_in.astype(dtype), w.astype(dtype), b.astype(jnp.float32),
                sc, sh, slope)
        import os
        try:
            if raw_in.shape[-1] < int(
                    os.environ.get("MTTPU_PALLAS_MIN_CIN", "32")):
                raise ValueError("cin below pallas threshold")
            if os.environ.get("MTTPU_FUSED_STATS") == "xla":
                # stats via an XLA reduce instead of the kernel epilogue:
                # the reduce overlaps with downstream kernels rather than
                # serializing into this one's block loop
                out = pallas_conv3d_same_affine(
                    raw_in.astype(dtype), w.astype(dtype), bias=b,
                    in_scale=sc, in_shift=sh, negative_slope=slope,
                    interpret=interpret, with_stats=False)
                return out, pc.channel_stats(out)
            return pallas_conv3d_same_affine(
                raw_in.astype(dtype), w.astype(dtype), bias=b,
                in_scale=sc, in_shift=sh, negative_slope=slope,
                interpret=interpret)
        except ValueError:
            x_in = raw_in.astype(dtype)
            if affine is not None:
                bshape = (x_in.shape[0],) + (1,) * (x_in.ndim - 2) + (-1,)
                y = (x_in.astype(jnp.float32) * sc.reshape(bshape)
                     + sh.reshape(bshape)).astype(dtype)
                x_in = jnp.where(y >= 0, y, y * slope)
            out = _conv_same(x_in, w, b, dtype=dtype)
            return out, pc.channel_stats(out)

    def affine_of(stats, bp, factors, nvox):
        return pc.stats_affine(stats, bp["norm"]["scale"], bp["norm"]["bias"],
                               factors=factors, nvox=nvox)

    def materialize(raw, stats, bp, factors):
        return pc.normalize_from_stats(raw, stats, bp["norm"]["scale"],
                                       bp["norm"]["bias"], factors=factors,
                                       negative_slope=slope)

    x = x.astype(dtype)
    cur = sfactors[0]
    if cur != UNPACKED:
        x = pc.space_to_depth_yx(x, cur)

    # ---- encoder ----------------------------------------------------------
    skips = []
    x_mat = x
    for d in range(num_pool + 1):
        name = "bottleneck" if d == num_pool else f"enc{d}"
        p = params[name]
        nxt = sfactors[d] if d < num_pool else UNPACKED
        if d == 0:
            raw, stats = fused_block(x_mat, p["block0"], None, cur)
            prev_bp = p["block0"]
            start = 1
        else:
            stride = tuple(model.pool_op_kernel_sizes[d - 1])
            bp = p["block0"]
            w, b = bp["conv"]["kernel"], bp["conv"]["bias"]
            if cur != UNPACKED:
                raw = pc.packed_strided_conv3d(
                    x_mat.astype(dtype), w.astype(dtype), z_stride=stride[0],
                    factors=cur) + b.astype(dtype)
                if nxt != UNPACKED:
                    raw = pc.space_to_depth_yx(raw, nxt)
            else:
                assert nxt == UNPACKED
                raw = _conv_same(x_mat, w, b, stride, dtype)
            cur = nxt
            stats = pc.channel_stats(raw)
            prev_bp = bp
            start = 1
        for i in range(start, model.conv_per_stage):
            nvox = int(np.prod(raw.shape[1:-1]))
            aff = affine_of(stats, prev_bp, cur, nvox)
            raw, stats = fused_block(raw, p[f"block{i}"], aff, cur)
            prev_bp = p[f"block{i}"]
        x_mat = materialize(raw, stats, prev_bp, cur)
        if d < num_pool:
            skips.append(x_mat)

    # ---- decoder ----------------------------------------------------------
    seg_outputs = []
    for u in range(num_pool):
        s_idx = num_pool - 1 - u
        skip = skips[s_idx]
        target = sfactors[s_idx]
        stride = tuple(model.pool_op_kernel_sizes[s_idx])
        wt = params[f"up{u}"]["kernel"]
        if target != UNPACKED:
            if cur != UNPACKED:
                x_mat = pc.depth_to_space_yx(x_mat, cur)
            x_mat = pc.packed_conv_transpose3d(
                x_mat.astype(dtype), wt.astype(dtype), z_stride=stride[0],
                factors=target)
            cur = target
            ph = pc.nphases(target)
            n_, z_, yp_, xp_ = x_mat.shape[:4]
            cu = x_mat.shape[-1] // ph
            cs = skip.shape[-1] // ph
            x_mat = jnp.concatenate(
                [x_mat.reshape(n_, z_, yp_, xp_, ph, cu),
                 skip.astype(x_mat.dtype).reshape(n_, z_, yp_, xp_, ph, cs)],
                axis=-1).reshape(n_, z_, yp_, xp_, ph * (cu + cs))
        else:
            assert cur == UNPACKED
            x_mat = lax.conv_transpose(
                x_mat.astype(dtype), wt.astype(dtype), strides=stride,
                padding="VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            x_mat = jnp.concatenate([x_mat, skip.astype(x_mat.dtype)], axis=-1)
        raw, stats = fused_block(x_mat, params[f"dec{u}"]["block0"], None, cur)
        prev_bp = params[f"dec{u}"]["block0"]
        for i in range(1, model.conv_per_stage):
            nvox = int(np.prod(raw.shape[1:-1]))
            aff = affine_of(stats, prev_bp, cur, nvox)
            raw, stats = fused_block(raw, params[f"dec{u}"][f"block{i}"], aff,
                                     cur)
            prev_bp = params[f"dec{u}"][f"block{i}"]
        last = u == num_pool - 1
        if not last or deep_supervision or differentiable:
            x_mat = materialize(raw, stats, prev_bp, cur)
        if deep_supervision or (last and differentiable):
            hp = params[f"seg{u}"]
            hw = hp["kernel"]
            hb = hp.get("bias") if model.seg_output_bias else None
            if cur != UNPACKED:
                lg = pc.packed_pointwise_conv3d(
                    x_mat.astype(dtype), hw.astype(dtype),
                    jnp.tile(hb.astype(dtype), pc.nphases(cur))
                    if hb is not None else None, factors=cur)
                lg = pc.depth_to_space_yx(lg, cur)
            else:
                lg = _conv_same(x_mat, hw, hb, dtype=dtype)
            seg_outputs.append(lg.astype(jnp.float32))

    if deep_supervision:
        return seg_outputs[::-1]
    if differentiable:
        return seg_outputs[-1]

    # ---- inference seg head (full resolution only): the final normalize
    # rides the seg-head kernel's prologue instead of a separate full-res pass
    hp = params[f"seg{num_pool - 1}"]
    hw = hp["kernel"]
    hb = hp.get("bias") if model.seg_output_bias else None
    if packed_output:
        # packed-space accumulation caller (sliding-window engine): no d2s;
        # the final normalize materializes (as in the unfused schedule) and
        # the head stays a packed pointwise conv in the model dtype
        x_mat = materialize(raw, stats, prev_bp, cur)
        if cur != UNPACKED:
            logits = pc.packed_pointwise_conv3d(
                x_mat.astype(dtype), hw.astype(dtype),
                jnp.tile(hb.astype(dtype), pc.nphases(cur))
                if hb is not None else None, factors=cur)
        else:
            logits = _conv_same(x_mat, hw, hb, dtype=dtype)
        return logits, cur
    if cur != UNPACKED:
        nvox = int(np.prod(raw.shape[1:-1]))
        sc, sh = affine_of(stats, prev_bp, cur, nvox)
        # bf16 models emit bf16 logits: halves the full-res output write (and
        # the consumer's re-read) — the sliding-window engine converts to f32
        # for the sigmoid and accumulates in f32 either way; the default
        # (non-exact) engine already holds probabilities in bf16
        out_dt = dtype if dtype == jnp.bfloat16 else jnp.float32
        logits = seghead_d2s(raw.astype(dtype), hw,
                             hb.astype(jnp.float32) if hb is not None else None,
                             factors=cur, in_scale=sc, in_shift=sh,
                             negative_slope=slope, out_dtype=out_dt,
                             interpret=interpret)
    else:
        x_mat = materialize(raw, stats, prev_bp, cur)
        logits = _conv_same(x_mat, hw, hb, dtype=dtype).astype(jnp.float32)
    return logits


def _packed_enabled(env_var: str) -> bool:
    """Packed execution trades FLOPs for MXU utilization — a win on TPU, a
    pessimization on CPU (FLOP-bound). Default: on iff the default backend is
    a TPU; env var forces it on ("1") or off ("0") regardless."""
    import os
    val = os.environ.get(env_var)
    if val is not None:
        return val != "0"
    return jax.devices()[0].platform == "tpu"


def make_inference_apply_fn(model):
    """Inference apply_fn(params, batch)->full-res logits, choosing packed
    execution when the model qualifies (GenericUNet, InstanceNorm+LeakyReLU,
    no dropout) and MTTPU_PACKED_CONV is not disabled. Measured on v5e at the
    MultiTalent configuration: 245.9 -> 116.3 ms/sample (b2, bf16), bit-exact
    in fp32 and <1% max logit deviation in bf16."""
    import os
    packable = (isinstance(model, GenericUNet)
                and model.norm == "instance"
                and model.nonlin == "leaky_relu"
                and model.dropout_rate == 0.0
                and _packed_enabled("MTTPU_PACKED_CONV"))
    if packable:
        pmc = int(os.environ.get("MTTPU_PACK_MAX_CHANNELS", "128"))
        # conv+norm chain fusion is OPT-IN: on v5e hardware the fused chain
        # LOSES end-to-end — interleaved A/B on the (256,320,320) 8x-TTA
        # volume: plain 24.2 s vs fused 26.9 s (kernel stats) / 27.2 s (XLA
        # stats, MTTPU_FUSED_STATS=xla). Both stats schedules lose, so it is
        # the prologue/RAW chain itself (not just the stats epilogue) that
        # defeats XLA's conv/elementwise overlap.
        fuse = os.environ.get("MTTPU_FUSED_NORM") == "1"

        def apply_fn(params, batch):
            if fuse:
                try:
                    return packed_unet_forward_fused(model, params, batch,
                                                     pack_max_channels=pmc)
                except ValueError:
                    pass  # shape outside the kernels' block grid
            return packed_unet_forward(model, params, batch,
                                       deep_supervision=False,
                                       pack_max_channels=pmc, sparse=True)
        return apply_fn

    def apply_fn(params, batch):
        return model.apply({"params": params}, batch, deep_supervision=False)
    return apply_fn


def make_train_forward_fn(model):
    """Training forward fn(params, batch)->deep-supervision outputs, packed when
    the model qualifies (same conditions as make_inference_apply_fn; dropout
    must be 0, so the deterministic flag is irrelevant on the packed path).
    All packed ops are plain lax primitives, so jax.grad differentiates through
    them; the packed-weight construction is a gather whose backward is a
    scatter-add over the tiny weight tensors. Kill switch: MTTPU_PACKED_TRAIN=0.
    """
    import os
    packable = (isinstance(model, GenericUNet)
                and model.norm == "instance"
                and model.nonlin == "leaky_relu"
                and model.dropout_rate == 0.0
                and _packed_enabled("MTTPU_PACKED_TRAIN"))
    if packable:
        pmc = int(os.environ.get("MTTPU_PACK_MAX_CHANNELS", "128"))
        ds = model.deep_supervision
        # conv+norm fusion for the TRAINING forward (backward via the custom
        # VJP in conv3d_same_affine_fast). Opt-in until hardware-validated:
        # MTTPU_FUSED_TRAIN=1.
        fuse = os.environ.get("MTTPU_FUSED_TRAIN", "0") == "1"

        def fwd(params, batch, deterministic=True):
            if fuse:
                try:
                    return packed_unet_forward_fused(
                        model, params, batch, pack_max_channels=pmc,
                        deep_supervision=ds, differentiable=True)
                except ValueError:
                    pass
            return packed_unet_forward(model, params, batch,
                                       deep_supervision=ds,
                                       pack_max_channels=pmc)
        return fwd

    def fwd(params, batch, deterministic=True):
        return model.apply({"params": params}, batch,
                           deterministic=deterministic)
    return fwd
