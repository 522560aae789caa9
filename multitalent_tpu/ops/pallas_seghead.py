"""Fused seg-head for packed execution: 1x1x1 conv + depth-to-space in one kernel.

The packed UNet's final stage ends with a pointwise seg head producing 47
region channels per packing phase, followed by depth_to_space back to voxel
layout (ops/packed_unet.py seg-head branch). As separate XLA ops the
depth-to-space of the (N, 96, 192, 192, 47) fp32 logits costs three full-size
layout copies (~14 ms of the 124 ms b2 forward on v5e — measured by xprof);
fundamentally it is one read of the packed GEMM result that never needed to
hit HBM at all.

This kernel runs the phase-grouped head GEMM (one [M, P*C] x [P*C, K] dot per
phase, each phase's weights zero outside its row block) and performs the
phase->space interleave in VMEM before the block is written, so the only HBM
traffic is the bf16 packed input once in and the voxel-layout logits once out.

Reference behavior being fused: the 1x1x1 seg_outputs conv of
generic_UNet.py:349-351 at inference (only the full-resolution head,
neural_network.py:405).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, aff_ref, out_ref, *, bz, by, bx, fy, fx, k,
            zb, slope, has_affine):
    xb = x_ref[0]                       # (bz, by, bx, P*C)
    m = bz * by * bx
    pc = xb.shape[-1]
    if has_affine:
        # fused final instance-norm + LeakyReLU (the packed UNet's last
        # normalize pass): y = lrelu(x*scale + shift), per sample/channel.
        # Sign test on the fp32 value: Mosaic on v5e rejects bf16 cmpf, and
        # the cast preserves sign so xf >= 0 == y16 >= 0 (both agree at +-0).
        xf = xb.astype(jnp.float32) * aff_ref[0, 0] + aff_ref[0, 1]
        y16 = xf.astype(xb.dtype)
        xb = jnp.where(xf >= 0, y16, y16 * slope)
    # One dot per packing phase: phase p's weight matrix is zero outside rows
    # [p*C, (p+1)*C), so each dot extracts that phase's head logits without
    # lane-slicing the input. A single block-diagonal [P*C, P*K] GEMM whose
    # (m, P*K) result reshapes to (.., fy, fx, K) does the same FLOPs but the
    # 2D->6D shape cast does not lower ("infer-vector-layout: unsupported
    # shape cast"); stacking per-phase (.., K) results and interleaving via
    # the 6D transpose lowers cleanly on v5e.
    x2 = xb.reshape(m, pc)
    outs = []
    for p in range(fy * fx):
        g = jnp.dot(x2, w_ref[p], preferred_element_type=jnp.float32)
        outs.append((g + b_ref[:]).reshape(bz, by, bx, k))
    g = jnp.stack(outs, axis=3).reshape(bz, by, bx, fy, fx, k)
    # phase -> space: interleave fy into y, fx into x
    g = g.transpose(0, 1, 3, 2, 4, 5)
    out_ref[0] = g.reshape(bz, by * fy, bx * fx, k).astype(out_ref.dtype)


@lru_cache(maxsize=32)
def _build(n, z, yp, xp, pc, k, fy, fx, in_dtype, out_dtype, bz, by, bx,
           slope, has_affine, interpret=False):
    zb = z // bz
    grid = (n * zb, yp // by, xp // bx)
    kernel = partial(_kernel, bz=bz, by=by, bx=bx, fy=fy, fx=fx, k=k, zb=zb,
                     slope=slope, has_affine=has_affine)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bz, by, bx, pc),
                         lambda i, j, kk, zb=zb: (i // zb, i % zb, j, kk, 0)),
            pl.BlockSpec((fy * fx, pc, k), lambda i, j, kk: (0, 0, 0)),
            pl.BlockSpec((1, k), lambda i, j, kk: (0, 0)),
            pl.BlockSpec((1, 2, pc),
                         lambda i, j, kk, zb=zb: (i // zb, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, bz, by * fy, bx * fx, k),
            lambda i, j, kk, zb=zb: (i // zb, i % zb, j, kk, 0)),
        out_shape=jax.ShapeDtypeStruct((n, z, yp * fy, xp * fx, k),
                                       jnp.dtype(out_dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * z * yp * xp * pc * fy * fx * k,
            bytes_accessed=(n * z * yp * xp * pc * 2
                            + n * z * yp * fy * xp * fx * k * 4),
            transcendentals=0),
        interpret=interpret,
    )


def _pick_blocks(z, yp, xp):
    def best(dim, targets):
        for t in targets:
            if dim % t == 0:
                return t
        return None
    bz = best(z, (8, 6, 4, 12, 16, 2, 1))
    by = best(yp, (16, 12, 8, 24, 6, 4))
    bx = best(xp, (16, 8, 24, 32))
    if None in (bz, by, bx):
        return None
    return bz, by, bx


def seghead_d2s(x_packed, w, b=None, *, factors=(2, 2),
                out_dtype=jnp.float32, in_scale=None, in_shift=None,
                negative_slope: float = 1e-2, interpret: bool = False):
    """Pointwise seg head on a packed tensor, fused with depth_to_space_yx.

    x_packed: (N, Z, Y', X', P*C); w: canonical (1, 1, 1, C, K); b: (K,) or
    None. Returns (N, Z, Y'*fy, X'*fx, K) in `out_dtype`. Equals
    depth_to_space_yx(packed_pointwise_conv3d(x, w, tile(b)), factors).
    With in_scale/in_shift ((N, P*C) per-sample instance-norm affine), the
    kernel first applies leaky_relu(x*scale + shift) — the final normalize
    pass of the fused packed forward. Raises ValueError when the shape is
    unsupported (callers fall back)."""
    fy, fx = int(factors[0]), int(factors[1])
    p = fy * fx
    n, z, yp, xp, pc = x_packed.shape
    kz, ky, kx, c, k = w.shape
    if (kz, ky, kx) != (1, 1, 1) or pc != p * c:
        raise ValueError("unsupported seg head shape")
    if not interpret and jax.default_backend() != "tpu":
        raise ValueError("pallas seghead requires a TPU backend")
    has_affine = in_scale is not None
    if has_affine != (in_shift is not None):
        raise ValueError("in_scale and in_shift must be given together")
    blocks = _pick_blocks(z, yp, xp)
    if blocks is None:
        raise ValueError("unsupported spatial shape")
    bz, by, bx = blocks
    # per-phase weights: phase p's (P*C, K) matrix holds the head weights in
    # rows [p*C, (p+1)*C) and zeros elsewhere — one dot per phase in-kernel
    w2 = w[0, 0, 0].astype(x_packed.dtype)            # (C, K)
    wph = jnp.zeros((p, p * c, k), x_packed.dtype)
    for ph in range(p):
        wph = jax.lax.dynamic_update_slice(wph, w2[None], (ph, ph * c, 0))
    bias = jnp.zeros((1, k), jnp.float32) if b is None else \
        b.astype(jnp.float32)[None]
    aff = jnp.zeros((n, 2, pc), jnp.float32)
    if has_affine:
        aff = aff.at[:, 0].set(jnp.broadcast_to(
            jnp.asarray(in_scale, jnp.float32), (n, pc)))
        aff = aff.at[:, 1].set(jnp.broadcast_to(
            jnp.asarray(in_shift, jnp.float32), (n, pc)))
    call = _build(n, z, yp, xp, pc, k, fy, fx, str(x_packed.dtype),
                  str(jnp.dtype(out_dtype)), bz, by, bx,
                  float(negative_slope), has_affine, interpret)
    return call(x_packed, wph, bias, aff)


def seghead_enabled() -> bool:
    """Opt-in (MTTPU_PALLAS_SEGHEAD=1). The fused head+depth-to-space kernel
    compiles and is bit-correct on v5e, but end-to-end it LOSES to the XLA
    pointwise-conv + d2s path it replaces: steady-state sliding-window volume
    54.4 s (seghead only) vs 29.3 s (neither fused kernel) on the round-2
    hardware bisect — the kernel's phase-grouped GEMM serializes work the
    packed schedule otherwise overlaps. Kept as an exemplar and for future
    re-tuning."""
    import os
    return os.environ.get("MTTPU_PALLAS_SEGHEAD") == "1"
