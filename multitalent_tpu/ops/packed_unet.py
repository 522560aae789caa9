"""Packed-execution forward pass for GenericUNet: same params, MXU-shaped compute.

Executes a GenericUNet forward pass from the standard flax params pytree, but
runs the small-channel high-resolution stages in space-to-depth packed (y,x)
layout (ops/packed_conv.py). The parameters, outputs, and numerics match
`GenericUNet.apply` (bf16-exact up to reduction order); only the schedule of
the compute changes: C=30 convolutions become C=120 convolutions on a quarter
of the voxels, lifting MXU utilization from ~(30/128)^2 to ~40% measured on
v5e (native 28.5 ms -> packed 16.8 ms for the full-res 3x3x3 conv at
(2,96,192,192,30)).

Used by the sliding-window inference engine (the bench-critical path). The
reference has no analog — this is a TPU-specific execution strategy for the
architecture at generic_UNet.py:156-401.

Packing policy: encoder stage d (and the matching decoder stage) runs packed
iff 4*C_d <= `pack_max_channels` and every pooling transition it spans is
(sz, 2, 2) with sz in {1, 2}. Deep-supervision heads below the packed stages
are untouched. v5e measurements on the flagship (base 30, patch 96x192x192):
pack_max_channels=128 (stage 0 only) is the sweet spot — 100.5->67.4 ms b1,
245.9->116.3 ms/sample b2; packing the C=60/C=120 stages too (256/512) gives
back a few percent because 4*C overshoots the 128-lane tile.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from multitalent_tpu.models.generic_unet import GenericUNet, compute_stage_features
from multitalent_tpu.ops import packed_conv as pc


def _conv_same(x, w, b=None, strides=(1, 1, 1), dtype=jnp.bfloat16):
    pad = tuple(((k - 1) // 2, (k - 1) // 2) for k in w.shape[:3])
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
    return jnp.where(y >= 0, y, y * negative_slope)


def _block(x, p, *, strides=(1, 1, 1), negative_slope, dtype, packed: bool):
    """One ConvNormAct block (conv + bias -> InstanceNorm -> LeakyReLU)."""
    w, b = p["conv"]["kernel"], p["conv"]["bias"]
    ns, nb = p["norm"]["scale"], p["norm"]["bias"]
    if packed:
        assert strides == (1, 1, 1)
        out = pc.packed_conv3d(x.astype(dtype), w.astype(dtype))
        out = out + jnp.tile(b.astype(dtype), pc.P)
        return pc.packed_instance_norm(out, ns, nb,
                                       negative_slope=negative_slope)
    out = _conv_same(x, w, b, strides, dtype)
    return _instance_norm_lrelu(out, ns, nb, negative_slope)


def packable_stages(model: GenericUNet, patch_size: Sequence[int],
                    pack_max_channels: int = 256) -> int:
    """Number of leading resolution stages to run packed (0 = fully unpacked)."""
    if len(patch_size) != 3:
        return 0
    feats = compute_stage_features(model.base_num_features, model.num_pool + 1,
                                   model.max_num_features)
    n = 0
    y, x = patch_size[1], patch_size[2]
    for d in range(model.num_pool):
        if pc.P * feats[d] > pack_max_channels or y % pc.F or x % pc.F:
            break
        pool = tuple(model.pool_op_kernel_sizes[d])
        if pool[1:] != (2, 2) or pool[0] not in (1, 2):
            break
        n += 1
        y //= pool[1]
        x //= pool[2]
    return n


def packed_unet_forward(model: GenericUNet, params, x, *,
                        deep_supervision: bool = False,
                        pack_max_channels: int = 256):
    """Forward pass equal to model.apply({'params': params}, x,
    deep_supervision=...) but with the leading stages executed packed.

    x: (N, Z, Y, X, C_in) float array. Returns full-res logits (fp32) or the
    deep-supervision list, highest resolution first."""
    num_pool = model.num_pool
    dtype = model.dtype
    slope = model.negative_slope
    n_packed = packable_stages(model, x.shape[1:4], pack_max_channels)
    if n_packed == 0:
        out = model.apply({"params": params}, x, deep_supervision=deep_supervision)
        return out

    x = x.astype(dtype)
    packed = True
    x = pc.space_to_depth_yx(x)

    # ---- encoder ----------------------------------------------------------
    skips = []      # per stage: tensor
    skip_packed = []
    for d in range(num_pool + 1):
        name = "bottleneck" if d == num_pool else f"enc{d}"
        p = params[name]
        stride = tuple(model.pool_op_kernel_sizes[d - 1]) if d > 0 else (1, 1, 1)
        stage_packed = packed and d < n_packed
        nblocks = model.conv_per_stage
        for i in range(nblocks):
            bp = p[f"block{i}"]
            if i == 0 and d > 0:
                if packed:
                    # strided conv consumes the packing
                    w, b = bp["conv"]["kernel"], bp["conv"]["bias"]
                    out = pc.packed_strided_conv3d(
                        x.astype(dtype), w.astype(dtype), z_stride=stride[0])
                    out = out + b.astype(dtype)
                    if stage_packed:
                        out = pc.space_to_depth_yx(out)
                        x = pc.packed_instance_norm(
                            out, bp["norm"]["scale"], bp["norm"]["bias"],
                            negative_slope=slope)
                    else:
                        x = _instance_norm_lrelu(
                            out, bp["norm"]["scale"], bp["norm"]["bias"], slope)
                    packed = stage_packed
                else:
                    x = _block(x, bp, strides=stride, negative_slope=slope,
                               dtype=dtype, packed=False)
            else:
                x = _block(x, bp, negative_slope=slope, dtype=dtype,
                           packed=packed)
        if d < num_pool:
            skips.append(x)
            skip_packed.append(packed)

    # ---- decoder ----------------------------------------------------------
    seg_outputs = []
    for u in range(num_pool):
        s_idx = num_pool - 1 - u
        skip = skips[s_idx]
        target_packed = skip_packed[s_idx]
        stride = tuple(model.pool_op_kernel_sizes[s_idx])
        wt = params[f"up{u}"]["kernel"]
        if target_packed:
            if packed:
                x = pc.depth_to_space_yx(x)
            x = pc.packed_conv_transpose3d(x.astype(dtype), wt.astype(dtype),
                                           z_stride=stride[0])
            packed = True
            # phase-grouped concat: [up, skip] within each phase
            n_, z_, yp_, xp_ = x.shape[:4]
            cu = x.shape[-1] // pc.P
            cs = skip.shape[-1] // pc.P
            x = jnp.concatenate(
                [x.reshape(n_, z_, yp_, xp_, pc.P, cu),
                 skip.astype(x.dtype).reshape(n_, z_, yp_, xp_, pc.P, cs)],
                axis=-1).reshape(n_, z_, yp_, xp_, pc.P * (cu + cs))
        else:
            assert not packed
            x = lax.conv_transpose(
                x.astype(dtype), wt.astype(dtype), strides=stride,
                padding="VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        for i in range(model.conv_per_stage):
            x = _block(x, params[f"dec{u}"][f"block{i}"], negative_slope=slope,
                       dtype=dtype, packed=packed)
        # seg head
        if deep_supervision or u == num_pool - 1:
            hp = params[f"seg{u}"]
            hw = hp["kernel"]
            hb = hp.get("bias") if model.seg_output_bias else None
            if packed:
                logits = pc.packed_pointwise_conv3d(
                    x.astype(dtype), hw.astype(dtype),
                    jnp.tile(hb.astype(dtype), pc.P) if hb is not None else None)
                logits = pc.depth_to_space_yx(logits)
            else:
                logits = _conv_same(x, hw, hb, dtype=dtype)
            seg_outputs.append(logits.astype(jnp.float32))

    if deep_supervision:
        return seg_outputs[::-1]
    return seg_outputs[-1]


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
                and os.environ.get("MTTPU_PACKED_CONV", "1") != "0")
    if packable:
        pmc = int(os.environ.get("MTTPU_PACK_MAX_CHANNELS", "128"))

        def apply_fn(params, batch):
            return packed_unet_forward(model, params, batch,
                                       deep_supervision=False,
                                       pack_max_channels=pmc)
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
                and os.environ.get("MTTPU_PACKED_TRAIN", "1") != "0")
    if packable:
        pmc = int(os.environ.get("MTTPU_PACK_MAX_CHANNELS", "128"))
        ds = model.deep_supervision

        def fwd(params, batch, deterministic=True):
            return packed_unet_forward(model, params, batch,
                                       deep_supervision=ds,
                                       pack_max_channels=pmc)
        return fwd

    def fwd(params, batch, deterministic=True):
        return model.apply({"params": params}, batch,
                           deterministic=deterministic)
    return fwd
