"""Pallas stride-1 3x3x3 convolution for packed (C~120) stages.

Why a hand kernel when XLA's conv already runs the packed layers at ~42% MXU
utilization (ops/packed_conv.py): the remaining factor-2 sits in XLA's conv
lowering. At C=120 every filter tap is an MXU-shaped GEMM on its own
(K = N = 120 -> ~94% of one 128x128 tile), so the conv decomposes into 27
shifted [M,120]x[120,120] dots accumulated in fp32. That formulation loses in
XLA (each dot round-trips HBM: measured 151 ms vs 34.5 ms native at C=30) but
can win in Pallas where the haloed input block and the accumulator never leave
VMEM.

Layout: channels-last (N, Z, Y, X, C) bf16, SAME padding via an XLA pre-pad
(pad once, slice windows freely). Grid over (batch*z-blocks, y-blocks,
x-blocks); each program DMAs its (bz+2, by+2, bx+2, C) halo block HBM->VMEM,
runs the 27-tap accumulation on the MXU, and writes the (bz, by, bx, C) bf16
result.

Forward-only: callers keep XLA's conv for the backward pass (packed_conv3d
gradients), which preserves training correctness while this kernel powers the
sliding-window inference path. Enable with MTTPU_PALLAS_CONV=1 (off by default
unless it beats XLA on the target shape — see
documentation/performance_notes.md for measurements).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_ref, w_ref, out_ref, xblk, sems, *, bz, by, bx, c, cout,
                 zb, yb, xb):
    # The x (sublane) dim of HBM slices must be 8-aligned, so the input is
    # pre-padded by 8 in x and each program over-fetches an aligned bx+16
    # window; the +-1 halo sits at in-window offset 7..bx+9. z/y dims carry
    # no alignment constraint and use exact +-1 halos.
    #
    # TPU grids execute sequentially on the core, so the two-slot scratch
    # double-buffers the halo DMA across grid steps: step g waits on its own
    # slot and prefetches step g+1's block into the other.
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    g = (i * yb + j) * xb + k
    n_steps = pl.num_programs(0) * yb * xb
    slot = jax.lax.rem(g, 2)

    def start_fetch(step, slot):
        kk = jax.lax.rem(step, xb)
        jj = jax.lax.rem(step // xb, yb)
        ii = step // (xb * yb)
        dma = pltpu.make_async_copy(
            x_ref.at[ii // zb, pl.ds(jax.lax.rem(ii, zb) * bz, bz + 2),
                     pl.ds(jj * by, by + 2), pl.ds(kk * bx, bx + 16), :],
            xblk.at[slot], sems.at[slot])
        dma.start()
        return dma

    @pl.when(g == 0)
    def _():
        start_fetch(0, 0)

    @pl.when(g + 1 < n_steps)
    def _():
        start_fetch(g + 1, 1 - slot)

    pltpu.make_async_copy(x_ref.at[0, pl.ds(0, bz + 2), pl.ds(0, by + 2),
                                   pl.ds(0, bx + 16), :],
                          xblk.at[slot], sems.at[slot]).wait()

    def body(acc):
        acc[:] = jnp.zeros_like(acc)
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    xs = xblk[slot, dz:dz + bz, dy:dy + by,
                              dx + 7:dx + 7 + bx, :]
                    a2 = xs.reshape(bz * by * bx, c)
                    wt = w_ref[dz, dy, dx, :, :]
                    acc[:] += jnp.dot(a2, wt,
                                      preferred_element_type=jnp.float32)
        out_ref[0] = acc[:].reshape(bz, by, bx, cout).astype(out_ref.dtype)

    pl.run_scoped(body, pltpu.VMEM((bz * by * bx, cout), jnp.float32))


@lru_cache(maxsize=32)
def _build(n, z, y, x, c, cout, dtype_name, bz, by, bx, interpret=False):
    dtype = jnp.dtype(dtype_name)
    zb = z // bz
    yb = y // by
    xb = x // bx
    grid = (n * zb, yb, xb)
    kernel = partial(_conv_kernel, bz=bz, by=by, bx=bx, c=c, cout=cout,
                     zb=zb, yb=yb, xb=xb)
    flops = 2 * 27 * c * cout * n * z * y * x

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # padded input, DMA'd manually
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights resident
        ],
        out_specs=pl.BlockSpec(
            (1, bz, by, bx, cout),
            lambda i, j, k, zb=zb: (i // zb, i % zb, j, k, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, z, y, x, cout), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bz + 2, by + 2, bx + 16, c), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(n * (z + 2) * (y + 2) * (x + 16) * c * 2
                            + n * z * y * x * cout * 2),
            transcendentals=0),
        interpret=interpret,
    )


def _pick_blocks(z, y, x):
    """Block sizes dividing the spatial dims, sized for ~1 MB VMEM blocks.

    MTTPU_PALLAS_BLOCK="bz,by,bx" overrides (A/B hook): used when it divides
    the dims (bx a multiple of 8), otherwise the defaults apply — engine
    shapes vary per stage, so a global override must degrade gracefully."""
    import os
    ov = os.environ.get("MTTPU_PALLAS_BLOCK")
    if ov:
        try:
            obz, oby, obx = (int(v) for v in ov.split(","))
        except ValueError:
            obz = oby = obx = 0
        if (obx % 8 == 0 and obx > 0 and z % obz == 0 and y % oby == 0
                and x % obx == 0):
            return obz, oby, obx

    def best(dim, targets):
        for t in targets:
            if dim % t == 0:
                return t
        return None
    bz = best(z, (8, 6, 4, 12, 2))
    by = best(y, (16, 12, 24, 8, 6, 4))
    # bx must be a multiple of 8: HBM->VMEM DMA windows start at kk*bx in the
    # sublane (x) dim and sublane slice starts must be 8-aligned — the +8
    # pre-pad only yields aligned windows when bx % 8 == 0 (bx=12 would
    # compile-fail in Mosaic with no fallback).
    bx = best(x, (16, 8, 24))
    if None in (bz, by, bx):
        return None
    return bz, by, bx


def pallas_conv3d_same(x, w, *, interpret: bool = False):
    """Stride-1 SAME 3x3x3 conv, channels-last; raises ValueError when the
    shape is unsupported (callers fall back to lax.conv). Channels are padded
    to the 128-lane tile inside (HBM->VMEM DMA slices must be lane-aligned);
    for the target C=120 that costs 6.7% extra FLOPs."""
    n, z, y, xdim, c = x.shape
    kz, ky, kx, cin, cout = w.shape
    if (kz, ky, kx) != (3, 3, 3) or cin != c:
        raise ValueError("unsupported kernel")
    if not interpret and jax.default_backend() != "tpu":
        # non-interpret pallas_call fails at LOWERING time on CPU — inside jit
        # that is past the callers' try/except ValueError, so refuse here
        raise ValueError("pallas conv requires a TPU backend")
    blocks = _pick_blocks(z, y, xdim)
    if blocks is None:
        raise ValueError("unsupported shape")
    bz, by, bx = blocks
    cp = -(-c // 128) * 128
    coutp = -(-cout // 128) * 128
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (8, 8), (0, cp - c)))
    wp = jnp.pad(w, ((0, 0),) * 3 + ((0, cp - c), (0, coutp - cout)))
    call = _build(n, z, y, xdim, cp, coutp, str(x.dtype), bz, by, bx,
                  interpret)
    out = call(xpad, wp.astype(x.dtype))
    return out[..., :cout] if coutp != cout else out


def pallas_conv_enabled() -> bool:
    """Default: on for TPU backends (measured 118.7 vs XLA's 82.7 TFLOP/s on
    the packed C=120 flagship conv); env MTTPU_PALLAS_CONV forces on/off."""
    import os
    val = os.environ.get("MTTPU_PALLAS_CONV")
    if val is not None:
        return val != "0"
    return jax.devices()[0].platform == "tpu"


def _wgrad_kernel(x_ref, g_ref, out_ref, xblk, sems, *, bz, by, bx, c, cout,
                  zb, yb, xb):
    """dw[tap, ci, co] = sum over all output voxels of x_shifted * g: 27
    [C, M] x [M, Cout] tap-GEMMs per block, accumulated into a VMEM-resident
    fp32 [27, C, Cout] across the (sequential) grid. Reuses the forward
    kernel's haloed-x double-buffered DMA; g arrives via a BlockSpec."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    g = (i * yb + j) * xb + k
    n_steps = pl.num_programs(0) * yb * xb
    slot = jax.lax.rem(g, 2)

    def start_fetch(step, slot):
        kk = jax.lax.rem(step, xb)
        jj = jax.lax.rem(step // xb, yb)
        ii = step // (xb * yb)
        dma = pltpu.make_async_copy(
            x_ref.at[ii // zb, pl.ds(jax.lax.rem(ii, zb) * bz, bz + 2),
                     pl.ds(jj * by, by + 2), pl.ds(kk * bx, bx + 16), :],
            xblk.at[slot], sems.at[slot])
        dma.start()
        return dma

    @pl.when(g == 0)
    def _():
        start_fetch(0, 0)
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(g + 1 < n_steps)
    def _():
        start_fetch(g + 1, 1 - slot)

    pltpu.make_async_copy(x_ref.at[0, pl.ds(0, bz + 2), pl.ds(0, by + 2),
                                   pl.ds(0, bx + 16), :],
                          xblk.at[slot], sems.at[slot]).wait()

    gs = g_ref[0].reshape(bz * by * bx, cout)
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                t = (dz * 3 + dy) * 3 + dx
                xs = xblk[slot, dz:dz + bz, dy:dy + by,
                          dx + 7:dx + 7 + bx, :]
                a2 = xs.reshape(bz * by * bx, c)
                out_ref[t] += jax.lax.dot_general(
                    a2, gs, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)


@lru_cache(maxsize=32)
def _build_wgrad(n, z, y, x, c, cout, dtype_name, bz, by, bx,
                 interpret=False):
    dtype = jnp.dtype(dtype_name)
    zb = z // bz
    yb = y // by
    xb = x // bx
    grid = (n * zb, yb, xb)
    kernel = partial(_wgrad_kernel, bz=bz, by=by, bx=bx, c=c, cout=cout,
                     zb=zb, yb=yb, xb=xb)
    flops = 2 * 27 * c * cout * n * z * y * x

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # padded x, DMA'd manually
            pl.BlockSpec((1, bz, by, bx, cout),
                         lambda i, j, k, zb=zb: (i // zb, i % zb, j, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((27, c, cout), lambda i, j, k: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((27, c, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, bz + 2, by + 2, bx + 16, c), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(n * (z + 2) * (y + 2) * (x + 16) * c * 2
                            + n * z * y * x * cout * 2),
            transcendentals=0),
        # the VMEM-resident [27, C, Cout] fp32 accumulator breaks libtpu's
        # default 16 MB scoped-vmem budget at the wide decoder stages (e.g.
        # 27x640x384 = 26.5 MB -> "Ran out of memory in memory space vmem");
        # v5e has 128 MB VMEM, grant headroom like _build_affine does.
        # Shapes too big even for this are rejected in
        # pallas_conv3d_same_wgrad (callers fall back to the XLA wgrad).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def pallas_conv3d_same_wgrad(x, g, *, interpret: bool = False):
    """dL/dw of the stride-1 SAME 3x3x3 conv: x (N,Z,Y,X,Cin), cotangent g
    (N,Z,Y,X,Cout) -> dw (3,3,3,Cin,Cout) fp32. Same shape constraints as
    pallas_conv3d_same; raises ValueError when unsupported."""
    n, z, y, xdim, c = x.shape
    ng, zg, yg, xg, cout = g.shape
    if (ng, zg, yg, xg) != (n, z, y, xdim):
        raise ValueError("shape mismatch")
    if not interpret and jax.default_backend() != "tpu":
        raise ValueError("pallas conv requires a TPU backend")
    blocks = _pick_blocks(z, y, xdim)
    if blocks is None:
        raise ValueError("unsupported shape")
    bz, by, bx = blocks
    cp = -(-c // 128) * 128
    coutp = -(-cout // 128) * 128
    # accumulator + double-buffered halo scratch + one g block must fit the
    # (raised, see _build_wgrad) scoped-vmem budget
    acc_bytes = 27 * cp * coutp * 4
    scratch_bytes = (2 * (bz + 2) * (by + 2) * (bx + 16) * cp
                     + bz * by * bx * coutp) * 2
    if acc_bytes + scratch_bytes > 88 * 1024 * 1024:
        raise ValueError("wgrad accumulator exceeds VMEM")
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (8, 8), (0, cp - c)))
    gp = jnp.pad(g, ((0, 0),) * 4 + ((0, coutp - cout),)) \
        if coutp != cout else g
    call = _build_wgrad(n, z, y, xdim, cp, coutp, str(x.dtype), bz, by, bx,
                        interpret)
    dw = call(xpad, gp.astype(x.dtype))
    return dw.reshape(3, 3, 3, cp, coutp)[:, :, :, :c, :cout]


def _conv_affine_kernel(x_ref, w_ref, aff_ref, bias_ref, out_ref, *rest,
                        bz, by, bx, c, cout, zb, yb, xb,
                        zdim, ydim, xdim, slope, has_affine, with_stats=True):
    """Tap-GEMM conv with a fused normalize prologue and a stats epilogue.

    Prologue (has_affine): the fetched block holds the PREVIOUS conv's raw
    (pre-norm) output; applies y = leaky_relu(x*scale + shift) per channel in
    VMEM — the instance-norm scale/shift computed by XLA from the previous
    kernel's stats output — and zeroes the SAME-pad halo (whose pre-norm ring
    is zero, but lrelu(shift) is not). This removes one full HBM
    read+write of the activation per fused block (the XLA normalize pass).

    Epilogue (with_stats): per-sample per-channel sum and sum-of-squares of
    the written (bias-added, bf16-rounded) output, accumulated across the
    sequential grid into stats[n, 2, cout] — the NEXT norm then needs no
    reduction pass. with_stats=False skips the epilogue entirely (the caller
    reduces in XLA, which overlaps it with downstream kernels instead of
    serializing it into this one)."""
    if with_stats:
        stats_ref, xblk, sems = rest
    else:
        stats_ref = None
        xblk, sems = rest
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    g = (i * yb + j) * xb + k
    n_steps = pl.num_programs(0) * yb * xb
    slot = jax.lax.rem(g, 2)

    def start_fetch(step, slot):
        kk = jax.lax.rem(step, xb)
        jj = jax.lax.rem(step // xb, yb)
        ii = step // (xb * yb)
        dma = pltpu.make_async_copy(
            x_ref.at[ii // zb, pl.ds(jax.lax.rem(ii, zb) * bz, bz + 2),
                     pl.ds(jj * by, by + 2), pl.ds(kk * bx, bx + 16), :],
            xblk.at[slot], sems.at[slot])
        dma.start()
        return dma

    @pl.when(g == 0)
    def _():
        start_fetch(0, 0)

    @pl.when(g + 1 < n_steps)
    def _():
        start_fetch(g + 1, 1 - slot)

    pltpu.make_async_copy(x_ref.at[0, pl.ds(0, bz + 2), pl.ds(0, by + 2),
                                   pl.ds(0, bx + 16), :],
                          xblk.at[slot], sems.at[slot]).wait()

    xv = xblk[slot]
    if has_affine:
        xf = xv.astype(jnp.float32) * aff_ref[0, 0] + aff_ref[0, 1]
        # cast before the activation (InstanceNorm -> leaky_relu order in
        # blocks.py / packed_instance_norm). The sign test runs on the fp32
        # value: Mosaic on v5e rejects bf16 cmpf ("Target does not support
        # this comparison"), and the cast preserves sign, so xf >= 0 picks
        # the same branch as y16 >= 0 (both branches agree at +-0).
        y16 = xf.astype(xblk.dtype)
        y16 = jnp.where(xf >= 0, y16, y16 * slope)
        # zero the halo: valid padded coords are z,y in [1, dim], x in
        # [8, xdim+8) (the +-8 x pre-pad)
        z0 = jax.lax.rem(i, zb) * bz
        y0 = j * by
        x0 = k * bx
        shp = (bz + 2, by + 2, bx + 16, 1)
        iz = jax.lax.broadcasted_iota(jnp.int32, shp, 0) + z0
        iy = jax.lax.broadcasted_iota(jnp.int32, shp, 1) + y0
        ix = jax.lax.broadcasted_iota(jnp.int32, shp, 2) + x0
        mask = ((iz >= 1) & (iz <= zdim) & (iy >= 1) & (iy <= ydim)
                & (ix >= 8) & (ix < xdim + 8))
        xv = jnp.where(mask, y16, jnp.zeros_like(y16))

    def body(acc):
        acc[:] = jnp.zeros_like(acc)
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    xs = xv[dz:dz + bz, dy:dy + by, dx + 7:dx + 7 + bx, :]
                    a2 = xs.reshape(bz * by * bx, c)
                    wt = w_ref[dz, dy, dx, :, :]
                    acc[:] += jnp.dot(a2, wt,
                                      preferred_element_type=jnp.float32)
        outb = (acc[:] + bias_ref[0]).astype(out_ref.dtype)
        out_ref[0] = outb.reshape(bz, by, bx, cout)

        if with_stats:
            @pl.when((jax.lax.rem(i, zb) == 0) & (j == 0) & (k == 0))
            def _():
                stats_ref[...] = jnp.zeros_like(stats_ref)

            of = outb.astype(jnp.float32)
            stats_ref[0, 0, :] += jnp.sum(of, axis=0)
            stats_ref[0, 1, :] += jnp.sum(of * of, axis=0)

    pl.run_scoped(body, pltpu.VMEM((bz * by * bx, cout), jnp.float32))


@lru_cache(maxsize=64)
def _build_affine(n, z, y, x, c, cout, dtype_name, bz, by, bx, slope,
                  has_affine, interpret=False, with_stats=True):
    dtype = jnp.dtype(dtype_name)
    zb = z // bz
    yb = y // by
    xb = x // bx
    grid = (n * zb, yb, xb)
    kernel = partial(_conv_affine_kernel, bz=bz, by=by, bx=bx, c=c, cout=cout,
                     zb=zb, yb=yb, xb=xb, zdim=z, ydim=y, xdim=x, slope=slope,
                     has_affine=has_affine, with_stats=with_stats)
    flops = 2 * 27 * c * cout * n * z * y * x

    out_specs = [
        pl.BlockSpec((1, bz, by, bx, cout),
                     lambda i, j, k, zb=zb: (i // zb, i % zb, j, k, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((n, z, y, x, cout), dtype)]
    if with_stats:
        out_specs.append(pl.BlockSpec((1, 2, cout),
                                      lambda i, j, k, zb=zb: (i // zb, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((n, 2, cout), jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # padded input, DMA'd manually
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights resident
            pl.BlockSpec((1, 2, c),
                         lambda i, j, k, zb=zb: (i // zb, 0, 0)),  # scale/shift
            pl.BlockSpec((1, cout), lambda i, j, k: (0, 0)),    # bias
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, bz + 2, by + 2, bx + 16, c), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(n * (z + 2) * (y + 2) * (x + 16) * c * 2
                            + n * z * y * x * cout * 2),
            transcendentals=0),
        # the interior C=240->256 stages exceed libtpu's default 16 MB scoped
        # vmem budget by a few hundred KB (double-buffered halo scratch +
        # resident 3^3 weights at c=256); v5e has 128 MB VMEM, so grant the
        # kernel headroom instead of shrinking blocks (smaller blocks cost
        # DMA efficiency on every stage, not just the big-C ones)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )


def pallas_conv3d_same_affine(x, w, *, bias=None, in_scale=None,
                              in_shift=None, negative_slope: float = 1e-2,
                              interpret: bool = False, with_stats: bool = True):
    """Stride-1 SAME 3x3x3 conv with fused pre-normalize and stats output.

    When in_scale/in_shift are given ((C,) shared or (N, C) per sample — the
    instance-norm case), x is the previous conv's RAW output and the kernel
    computes conv(leaky_relu(x * in_scale + in_shift), w) + bias with
    SAME-zero-pad semantics applied to the normalized tensor. Returns
    (out, stats) with stats[n, 0/1, c] the per-sample channel sum / sum of
    squares of out — enough for the consumer's instance norm without another
    reduction. Raises ValueError when the shape is unsupported."""
    import os
    n, z, y, xdim, c = x.shape
    kz, ky, kx, cin, cout = w.shape
    if (kz, ky, kx) != (3, 3, 3) or cin != c:
        raise ValueError("unsupported kernel")
    if c < int(os.environ.get("MTTPU_PALLAS_MIN_CIN", "32")):
        # tiny C wastes the 128-lane K dim; XLA's implicit-im2col conv
        # (K = 27*C) is the better formulation below the threshold
        raise ValueError("cin below pallas threshold")
    if not interpret and jax.default_backend() != "tpu":
        raise ValueError("pallas conv requires a TPU backend")
    has_affine = in_scale is not None
    if has_affine != (in_shift is not None):
        raise ValueError("in_scale and in_shift must be given together")
    blocks = _pick_blocks(z, y, xdim)
    if blocks is None:
        raise ValueError("unsupported shape")
    bz, by, bx = blocks
    cp = -(-c // 128) * 128
    coutp = -(-cout // 128) * 128
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (8, 8), (0, cp - c)))
    wp = jnp.pad(w, ((0, 0),) * 3 + ((0, cp - c), (0, coutp - cout)))
    aff = jnp.zeros((n, 2, cp), jnp.float32)
    if has_affine:
        in_scale = jnp.broadcast_to(jnp.asarray(in_scale, jnp.float32),
                                    (n, c))
        in_shift = jnp.broadcast_to(jnp.asarray(in_shift, jnp.float32),
                                    (n, c))
        aff = aff.at[:, 0, :c].set(in_scale)
        aff = aff.at[:, 1, :c].set(in_shift)
    bvec = jnp.zeros((1, coutp), jnp.float32)
    if bias is not None:
        bvec = bvec.at[0, :cout].set(bias.astype(jnp.float32))
    call = _build_affine(n, z, y, xdim, cp, coutp, str(x.dtype), bz, by, bx,
                         float(negative_slope), has_affine, interpret,
                         with_stats)
    if not with_stats:
        (out,) = call(xpad, wp.astype(x.dtype), aff, bvec)
        return out[..., :cout] if coutp != cout else out
    out, stats = call(xpad, wp.astype(x.dtype), aff, bvec)
    if coutp != cout:
        out = out[..., :cout]
        stats = stats[..., :cout]
    return out, stats


def _affine_lrelu(x, in_scale, in_shift, slope):
    """The fused kernel's prologue as XLA ops: leaky_relu(cast(x*s + t)).
    in_scale/in_shift are (N, C) per-sample (instance norm) or (C,) shared."""
    bshape = ((in_scale.shape[0],) + (1,) * (x.ndim - 2) + (-1,)
              if in_scale.ndim == 2 else (-1,))
    y = (x.astype(jnp.float32) * in_scale.reshape(bshape).astype(jnp.float32)
         + in_shift.reshape(bshape).astype(jnp.float32))
    y = y.astype(x.dtype)
    return jnp.maximum(y, y * slope)


def _ref_conv_affine(x, w, bias, in_scale, in_shift, slope):
    """XLA reference composition of pallas_conv3d_same_affine (same dtype
    behavior: fp32 accumulate + bias, rounded to the input dtype)."""
    y = (x if in_scale is None
         else _affine_lrelu(x, in_scale, in_shift, slope))
    out = _ref_conv(y, w).astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    out = out.astype(x.dtype)
    of = out.astype(jnp.float32)
    axes = tuple(range(1, x.ndim - 1))
    stats = jnp.stack([jnp.sum(of, axis=axes),
                       jnp.sum(of * of, axis=axes)], axis=1)
    return out, stats


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def conv3d_same_affine_fast(x, w, bias, in_scale, in_shift,
                            negative_slope=1e-2):
    """Differentiable fused normalize+conv+stats: Pallas forward when the
    shape qualifies, composed XLA otherwise. Returns (out, stats) like
    pallas_conv3d_same_affine. The backward pass recomputes the (cheap,
    elementwise) normalized tensor and reuses the Pallas dx/wgrad conv
    kernels; gradients also flow through the stats outputs (the next layer's
    instance-norm affine is a function of them)."""
    try:
        return pallas_conv3d_same_affine(
            x, w, bias=bias, in_scale=in_scale, in_shift=in_shift,
            negative_slope=negative_slope)
    except ValueError:
        return _ref_conv_affine(x, w, bias, in_scale, in_shift,
                                negative_slope)


def _affine_fast_fwd(x, w, bias, in_scale, in_shift, negative_slope):
    out, stats = conv3d_same_affine_fast(x, w, bias, in_scale, in_shift,
                                         negative_slope)
    return (out, stats), (x, w, in_scale, in_shift, out)


def _affine_fast_bwd(negative_slope, res, cts):
    x, w, in_scale, in_shift, out = res
    g_out, g_stats = cts
    # stats = [sum(out), sum(out^2)]: fold their cotangents into out's
    axes = tuple(range(1, x.ndim - 1))
    bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (-1,)
    G = (g_out.astype(jnp.float32)
         + g_stats[:, 0].reshape(bshape)
         + 2.0 * out.astype(jnp.float32) * g_stats[:, 1].reshape(bshape))
    G16 = G.astype(x.dtype)
    dbias = jnp.sum(G, axis=(0,) + axes)

    if in_scale is not None:
        y = _affine_lrelu(x, in_scale, in_shift, negative_slope)
    else:
        y = x

    # dw via the Pallas wgrad kernel; dY via the Pallas dx kernel
    if _pallas_wgrad_enabled():
        try:
            dw = pallas_conv3d_same_wgrad(y, G16).astype(w.dtype)
        except ValueError:
            _, vjp_w = jax.vjp(lambda wv: _ref_conv(y, wv), w)
            (dw,) = vjp_w(G16)
    else:
        _, vjp_w = jax.vjp(lambda wv: _ref_conv(y, wv), w)
        (dw,) = vjp_w(G16)
    try:
        dY = conv3d_same_dx(G16, w)
    except ValueError:
        _, vjp_x = jax.vjp(lambda yv: _ref_conv(yv, w), y)
        (dY,) = vjp_x(G16)

    if in_scale is None:
        return dY.astype(x.dtype), dw, dbias, None, None

    # y16 = cast(x*s + t); lrelu'(y16) = 1 [y16 >= 0] else slope
    sshape = (bshape if in_scale.ndim == 2 else (-1,))
    y16 = (x.astype(jnp.float32)
           * in_scale.reshape(sshape).astype(jnp.float32)
           + in_shift.reshape(sshape).astype(jnp.float32)).astype(x.dtype)
    dy16 = jnp.where(y16 >= 0, dY, dY * negative_slope).astype(jnp.float32)
    dx = (dy16 * in_scale.reshape(sshape).astype(jnp.float32)).astype(x.dtype)
    red_axes = axes if in_scale.ndim == 2 else (0,) + axes
    ds = jnp.sum(dy16 * x.astype(jnp.float32), axis=red_axes)
    dt = jnp.sum(dy16, axis=red_axes)
    return dx, dw, dbias, ds.astype(jnp.float32), dt.astype(jnp.float32)


conv3d_same_affine_fast.defvjp(_affine_fast_fwd, _affine_fast_bwd)


def _ref_conv(x, w):
    pad = tuple(((k - 1) // 2, (k - 1) // 2) for k in w.shape[:3])
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), pad, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _flip_kernel(w):
    """Kernel for the dx pass: spatial flip + cin/cout swap. For a SAME
    stride-1 conv, dL/dx = SAME-conv(dL/dy, flipped kernel) exactly."""
    return jnp.swapaxes(w[::-1, ::-1, ::-1], 3, 4)


def conv3d_same_dx(g, w, *, interpret: bool = False):
    """dL/dx of conv3d_same as a Pallas SAME conv of the cotangent."""
    return pallas_conv3d_same(g, _flip_kernel(w), interpret=interpret)


@jax.custom_vjp
def conv3d_same_fast(x, w):
    """SAME stride-1 conv: Pallas forward when the shape qualifies, XLA
    backward for dw; dx also rides the Pallas kernel (a SAME conv of the
    cotangent with the flipped kernel — same shape class as the forward)."""
    try:
        return pallas_conv3d_same(x, w)
    except ValueError:
        return _ref_conv(x, w)


def _fast_fwd(x, w):
    return conv3d_same_fast(x, w), (x, w)


def _pallas_wgrad_enabled() -> bool:
    import os
    val = os.environ.get("MTTPU_PALLAS_WGRAD")
    if val is not None:
        return val != "0"
    return True


def _fast_bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    try:
        dx = conv3d_same_dx(g, w)
    except ValueError:
        _, vjp_x = jax.vjp(lambda xv: _ref_conv(xv, w), x)
        (dx,) = vjp_x(g)
    if _pallas_wgrad_enabled():
        try:
            return dx, pallas_conv3d_same_wgrad(x, g).astype(w.dtype)
        except ValueError:
            pass
    _, vjp_w = jax.vjp(lambda wv: _ref_conv(x, wv), w)
    (dw,) = vjp_w(g)
    return dx, dw


conv3d_same_fast.defvjp(_fast_fwd, _fast_bwd)
