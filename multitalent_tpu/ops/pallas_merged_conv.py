"""Merged-tap GEMM conv for space-to-depth packed stages — gather-free.

The dense packed conv (ops/packed_conv.py + ops/pallas_conv.py) runs 27
[M, P*C] x [P*C, P*C] tap GEMMs whose weights are block-sparse in the phase
structure: packing (fy, fx) phases into lanes multiplies the executed FLOPs by
P = fy*fx. The first exploit attempt (ops/pallas_sparse_conv.py) compacted
phase subsets into narrower GEMMs via in-kernel lane gathers and LOST on v5e:
Mosaic lowers lane rotations as full-block relayout copies (~17 ms VPU against
~7 ms GEMM saved per stage-0 conv, documentation/performance_notes.md).

This kernel merges taps WITHOUT moving a single lane. Two packed taps whose
nonzero (input-phase -> output-phase) blocks are disjoint in BOTH rows and
columns can share one [P*C, P*C] GEMM whose weight is simply the SUM of the
two dense packed tap matrices — provided each input lane carries the value
from the spatial shift its phase needs. That per-lane choice is a
jnp.where(mask, shifted_view_a, shifted_view_b) between two halo-window
slices: a pure VPU select with sublane-broadcast mask, no lane movement. The
shifts themselves are the same z/y (major-dim) and x (sublane offset 7/8/9)
slices the dense tap kernel already takes.

  (2,2) packing — per z-tap: center (dense, 1 GEMM) + y-edges (2 taps -> 1,
  mask on py) + x-edges (2 -> 1, mask on px) + corners (4 -> 1, nested mask)
  = 4 GEMMs; 12 total instead of 27 (executed-FLOP ratio 4x -> 1.78x).

  (1,2) packing — per (z, y)-tap: x-center + merged x-edges = 2 GEMMs;
  18 total instead of 27 (2x -> 1.33x).

Every GEMM stays [M, 128] x [128, 128] (full MXU tiles); the win is pure
GEMM-count reduction at ~zero VPU cost. Forward/inference only, like the
other packed kernels: training keeps the dense path whose backward rides the
Pallas dx/wgrad kernels. Reference for the op computed:
nnunet/network_architecture/generic_UNet.py:28-144 (ConvDropoutNormNonlin);
the schedule is TPU-native with no reference analog.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def merged_conv_enabled() -> bool:
    """Default ON for TPU backends once adjudicated; MTTPU_PALLAS_MERGED
    forces on/off."""
    import os
    val = os.environ.get("MTTPU_PALLAS_MERGED")
    if val is not None:
        return val != "0"
    return jax.devices()[0].platform == "tpu"


def _n_groups(factors) -> int:
    return 4 if tuple(factors) == (2, 2) else 6


def merged_weights_from_packed(wp: jax.Array, factors) -> jax.Array:
    """Dense packed weight [3, 3, 3, P*Cin, P*Cout] (pack_conv_weights output)
    -> merged GEMM stack [3, G, P*Cin, P*Cout].

    Merged groups sum taps whose phase blocks are disjoint in both input and
    output lanes (guaranteed by the phase-tap structure for f=2, k=3), so the
    sum never overlaps a nonzero entry."""
    fy, fx = int(factors[0]), int(factors[1])
    assert wp.shape[:3] == (3, 3, 3), wp.shape
    if (fy, fx) == (2, 2):
        groups = [
            wp[:, 1, 1],                                            # center
            wp[:, 0, 1] + wp[:, 2, 1],                              # y-edges
            wp[:, 1, 0] + wp[:, 1, 2],                              # x-edges
            wp[:, 0, 0] + wp[:, 0, 2] + wp[:, 2, 0] + wp[:, 2, 2],  # corners
        ]
    elif (fy, fx) == (1, 2):
        groups = []
        for dy in range(3):
            groups.append(wp[:, dy, 1])                    # x-center at dy
            groups.append(wp[:, dy, 0] + wp[:, dy, 2])     # x-edges at dy
    else:
        raise ValueError(f"unsupported factors {(fy, fx)}")
    return jnp.stack(groups, axis=1)


def phase_masks(factors, cin: int, in_groups=None) -> tuple[np.ndarray, np.ndarray]:
    """Per-lane (py==1, px==1) masks for the tight packed lane layout
    (phase-major, or pack_conv_weights' group-concat layout when in_groups is
    given). Returned as float32 [P*Cin] (1.0 = phase 1)."""
    fy, fx = int(factors[0]), int(factors[1])
    p = fy * fx
    if in_groups is None:
        in_groups = (cin,)
    assert sum(in_groups) == cin, (in_groups, cin)
    py, px = [], []
    for g in in_groups:
        for q in range(p):
            py.extend([float(q // fx == 1)] * g)
            px.extend([float(q % fx == 1)] * g)
    return (np.asarray(py, np.float32), np.asarray(px, np.float32))


def _merged_kernel(x_ref, w_ref, my_ref, mx_ref, out_ref, xblk, sems, *,
                   bz, by, bx, c, cout, zb, yb, xb, scheme):
    """Same manual-DMA double-buffered halo pipeline as
    pallas_conv._conv_kernel; the inner loop runs merged-group GEMMs on
    per-lane selects of shifted halo views instead of 27 per-tap GEMMs."""
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

    M = bz * by * bx

    def _finish(acc):
        out_ref[0] = acc[:].reshape(bz, by, bx, cout).astype(out_ref.dtype)

    if scheme == "22":
        def body(acc, xy, xxh, xc):
            # Build each merged view ONCE per block into VMEM scratch (per-dz
            # GEMMs then slice only the z halo, which is free tile indexing):
            # computing the selects per dz instead materializes 3x the
            # relayout temporaries and eats the GEMM savings (measured 1.07x
            # end-to-end on v5e; this version reaches the tap-count ratio).
            my = (my_ref[0, :] > 0.5).reshape(1, 1, 1, c)
            mx = (mx_ref[0, :] > 0.5).reshape(1, 1, 1, c)
            xv = xblk[slot]
            # y-edges: py=1 lanes need the y-1 cell, py=0 the y+1 cell
            xy[:] = jnp.where(my, xv[:, 0:by, 8:8 + bx, :],
                              xv[:, 2:by + 2, 8:8 + bx, :])
            # x-edges WITH the y halo kept: the corner operand is then one
            # y-select of this buffer instead of the nested two-select on
            # xv (the y slices are free major-dim views) — 4 block-volume
            # selects become ~3.1
            xxh[:] = jnp.where(mx, xv[:, :, 7:7 + bx, :],
                               xv[:, :, 9:9 + bx, :])
            # corners: quadrant (py, px) -> (y -/+ 1, x -/+ 1)
            xc[:] = jnp.where(my, xxh[:, 0:by], xxh[:, 2:by + 2])
            acc[:] = jnp.zeros_like(acc)
            for dz in range(3):
                acc[:] += jnp.dot(
                    xv[dz:dz + bz, 1:1 + by, 8:8 + bx, :].reshape(M, c),
                    w_ref[dz, 0], preferred_element_type=jnp.float32)
                acc[:] += jnp.dot(xy[dz:dz + bz].reshape(M, c),
                                  w_ref[dz, 1],
                                  preferred_element_type=jnp.float32)
                acc[:] += jnp.dot(
                    xxh[dz:dz + bz, 1:1 + by].reshape(M, c),
                    w_ref[dz, 2], preferred_element_type=jnp.float32)
                acc[:] += jnp.dot(xc[dz:dz + bz].reshape(M, c),
                                  w_ref[dz, 3],
                                  preferred_element_type=jnp.float32)
            _finish(acc)

        pl.run_scoped(body, pltpu.VMEM((M, cout), jnp.float32),
                      pltpu.VMEM((bz + 2, by, bx, c), xblk.dtype),
                      pltpu.VMEM((bz + 2, by + 2, bx, c), xblk.dtype),
                      pltpu.VMEM((bz + 2, by, bx, c), xblk.dtype))
    else:  # "12": y unpacked, merge x only (full y halo kept for dy slicing)
        def body(acc, xx):
            mx = (mx_ref[0, :] > 0.5).reshape(1, 1, 1, c)
            xv = xblk[slot]
            xx[:] = jnp.where(mx, xv[:, :, 7:7 + bx, :],
                              xv[:, :, 9:9 + bx, :])
            acc[:] = jnp.zeros_like(acc)
            for dz in range(3):
                for dy in range(3):
                    acc[:] += jnp.dot(
                        xv[dz:dz + bz, dy:dy + by, 8:8 + bx, :].reshape(M, c),
                        w_ref[dz, 2 * dy], preferred_element_type=jnp.float32)
                    acc[:] += jnp.dot(
                        xx[dz:dz + bz, dy:dy + by].reshape(M, c),
                        w_ref[dz, 2 * dy + 1],
                        preferred_element_type=jnp.float32)
            _finish(acc)

        pl.run_scoped(body, pltpu.VMEM((M, cout), jnp.float32),
                      pltpu.VMEM((bz + 2, by + 2, bx, c), xblk.dtype))


@lru_cache(maxsize=32)
def _build(n, z, y, x, c, cout, dtype_name, bz, by, bx, scheme,
           interpret=False):
    dtype = jnp.dtype(dtype_name)
    zb = z // bz
    yb = y // by
    xb = x // bx
    grid = (n * zb, yb, xb)
    ngemm = 12 if scheme == "22" else 18
    kernel = partial(_merged_kernel, bz=bz, by=by, bx=bx, c=c, cout=cout,
                     zb=zb, yb=yb, xb=xb, scheme=scheme)
    flops = 2 * ngemm * c * cout * n * z * y * x

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # padded input, manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # merged weights resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # py mask [8, c]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # px mask [8, c]
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
        # the merged-view scratches push past the 16 MB default scoped-vmem
        # budget at the 256-lane decoder stages; actual usage stays well
        # under the v5e's physical VMEM
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)}),
    )


def _merged2_kernel(a_ref, b_ref, w_ref, mya_ref, mxa_ref, myb_ref, mxb_ref,
                    out_ref, ablk, bblk, sems_a, sems_b, *, bz, by, bx,
                    ca, cb, cout, zb, yb, xb):
    """Two-input merged-tap conv for the decoder's concat conv: runs the
    (2,2) merged schedule on BOTH inputs (up-path + skip) accumulating into
    one output — 24 GEMMs replacing the 27 double-width GEMMs of the dense
    grouped conv, and the [P*(c_up+c_skip)]-lane concat tensor is never
    materialized. w_ref stacks the two halves' merged weights as
    [2, 3, 4, 128, 128] (half, z-tap, group)."""
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
        for src, dst, sem in ((a_ref, ablk, sems_a), (b_ref, bblk, sems_b)):
            pltpu.make_async_copy(
                src.at[ii // zb, pl.ds(jax.lax.rem(ii, zb) * bz, bz + 2),
                       pl.ds(jj * by, by + 2), pl.ds(kk * bx, bx + 16), :],
                dst.at[slot], sem.at[slot]).start()

    @pl.when(g == 0)
    def _():
        start_fetch(0, 0)

    @pl.when(g + 1 < n_steps)
    def _():
        start_fetch(g + 1, 1 - slot)

    for src, dst, sem in ((a_ref, ablk, sems_a), (b_ref, bblk, sems_b)):
        pltpu.make_async_copy(src.at[0, pl.ds(0, bz + 2), pl.ds(0, by + 2),
                                     pl.ds(0, bx + 16), :],
                              dst.at[slot], sem.at[slot]).wait()

    M = bz * by * bx

    def body(acc, *scr):
        acc[:] = jnp.zeros_like(acc)
        for h, (blk, c, my_r, mx_r) in enumerate(
                ((ablk, ca, mya_ref, mxa_ref), (bblk, cb, myb_ref, mxb_ref))):
            xy, xxh, xc = scr[3 * h:3 * h + 3]
            my = (my_r[0, :] > 0.5).reshape(1, 1, 1, c)
            mx = (mx_r[0, :] > 0.5).reshape(1, 1, 1, c)
            xv = blk[slot]
            xy[:] = jnp.where(my, xv[:, 0:by, 8:8 + bx, :],
                              xv[:, 2:by + 2, 8:8 + bx, :])
            # x-edges with y halo; corners are one y-select of it (see
            # _merged_kernel)
            xxh[:] = jnp.where(mx, xv[:, :, 7:7 + bx, :],
                               xv[:, :, 9:9 + bx, :])
            xc[:] = jnp.where(my, xxh[:, 0:by], xxh[:, 2:by + 2])
            for dz in range(3):
                acc[:] += jnp.dot(
                    xv[dz:dz + bz, 1:1 + by, 8:8 + bx, :].reshape(M, c),
                    w_ref[h, dz, 0], preferred_element_type=jnp.float32)
                acc[:] += jnp.dot(xy[dz:dz + bz].reshape(M, c),
                                  w_ref[h, dz, 1],
                                  preferred_element_type=jnp.float32)
                acc[:] += jnp.dot(
                    xxh[dz:dz + bz, 1:1 + by].reshape(M, c),
                    w_ref[h, dz, 2], preferred_element_type=jnp.float32)
                acc[:] += jnp.dot(xc[dz:dz + bz].reshape(M, c),
                                  w_ref[h, dz, 3],
                                  preferred_element_type=jnp.float32)
        out_ref[0] = acc[:].reshape(bz, by, bx, cout).astype(out_ref.dtype)

    pl.run_scoped(
        body, pltpu.VMEM((M, cout), jnp.float32),
        pltpu.VMEM((bz + 2, by, bx, ca), ablk.dtype),
        pltpu.VMEM((bz + 2, by + 2, bx, ca), ablk.dtype),
        pltpu.VMEM((bz + 2, by, bx, ca), ablk.dtype),
        pltpu.VMEM((bz + 2, by, bx, cb), bblk.dtype),
        pltpu.VMEM((bz + 2, by + 2, bx, cb), bblk.dtype),
        pltpu.VMEM((bz + 2, by, bx, cb), bblk.dtype))


@lru_cache(maxsize=32)
def _build2(n, z, y, x, ca, cb, cout, dtype_name, bz, by, bx,
            interpret=False):
    dtype = jnp.dtype(dtype_name)
    zb = z // bz
    yb = y // by
    xb = x // bx
    grid = (n * zb, yb, xb)
    kernel = partial(_merged2_kernel, bz=bz, by=by, bx=bx, ca=ca, cb=cb,
                     cout=cout, zb=zb, yb=yb, xb=xb)
    flops = 2 * 12 * (ca + cb) * cout * n * z * y * x

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # [2,3,4,128,128] weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # masks a
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # masks b
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bz, by, bx, cout),
            lambda i, j, k, zb=zb: (i // zb, i % zb, j, k, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, z, y, x, cout), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bz + 2, by + 2, bx + 16, ca), dtype),
            pltpu.VMEM((2, bz + 2, by + 2, bx + 16, cb), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(n * (z + 2) * (y + 2) * (x + 16) * (ca + cb) * 2
                            + n * z * y * x * cout * 2),
            transcendentals=0),
        interpret=interpret,
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)}),
    )


def prepare_merged2(w: jax.Array, factors, groups, *, dtype=None) -> dict:
    """Two-input variant for the decoder concat conv: canonical
    (3,3,3,g0+g1,Cout) weights split by input group, each half getting its
    own merged GEMM stack + masks. Only (2,2) with both halves within one
    K tile qualifies (where the single-input kernel wins)."""
    fy, fx = int(factors[0]), int(factors[1])
    if (fy, fx) != (2, 2):
        raise ValueError("merged2 requires (2,2) packing")
    g0, g1 = int(groups[0]), int(groups[1])
    p = fy * fx
    if p * g0 > 128 or p * g1 > 128:
        raise ValueError("merged2 halves must fit one K tile")
    halves = []
    for lo, hi in ((0, g0), (g0, g0 + g1)):
        half = prepare_merged(w[:, :, :, lo:hi, :], (fy, fx), None,
                              dtype=dtype)
        halves.append(half)
    wa, wb = halves[0]["wm"], halves[1]["wm"]
    if wa.shape != wb.shape:
        # pad the narrower half's K dim so both stack into one weight tensor
        cp = max(wa.shape[-2], wb.shape[-2])
        wa = jnp.pad(wa, ((0, 0), (0, 0), (0, cp - wa.shape[-2]), (0, 0)))
        wb = jnp.pad(wb, ((0, 0), (0, 0), (0, cp - wb.shape[-2]), (0, 0)))
    return {"wm": jnp.stack([wa, wb]),
            "my_a": halves[0]["my"], "mx_a": halves[0]["mx"],
            "my_b": halves[1]["my"], "mx_b": halves[1]["mx"],
            "pcout": halves[0]["pcout"], "groups": (g0, g1)}


def pallas_packed_conv3d_merged2(a: jax.Array, b: jax.Array, prepared: dict,
                                 *, interpret: bool = False) -> jax.Array:
    """Run the decoder concat conv from prepare_merged2 arrays on the
    UNCONCATENATED (up, skip) pair. Raises ValueError on unsupported
    shapes."""
    from multitalent_tpu.ops.pallas_conv import _pick_blocks
    n, z, y, xdim, pca = a.shape
    pcb = b.shape[-1]
    if b.shape[:4] != a.shape[:4]:
        raise ValueError("input halves disagree on shape")
    if not interpret and jax.default_backend() != "tpu":
        raise ValueError("pallas merged conv requires a TPU backend")
    blocks = _pick_blocks(z, y, xdim)
    if blocks is None:
        raise ValueError("unsupported shape")
    bz, by, bx = blocks
    cp = prepared["wm"].shape[-2]
    pcout = prepared["pcout"]
    coutp = prepared["wm"].shape[-1]
    if pca > cp or pcb > cp:
        raise ValueError("prepared weights do not match input lanes")
    pad = ((0, 0), (1, 1), (1, 1), (8, 8))
    apad = jnp.pad(a, pad + ((0, cp - pca),))
    bpad = jnp.pad(b.astype(a.dtype), pad + ((0, cp - pcb),))
    call = _build2(n, z, y, xdim, cp, cp, coutp, str(a.dtype), bz, by, bx,
                   interpret)
    out = call(apad, bpad, prepared["wm"].astype(a.dtype),
               jnp.asarray(prepared["my_a"]), jnp.asarray(prepared["mx_a"]),
               jnp.asarray(prepared["my_b"]), jnp.asarray(prepared["mx_b"]))
    return out[..., :pcout] if coutp != pcout else out


def _prep_from_packed(wp: jax.Array, factors, cin: int, in_groups=None) -> dict:
    """Merged GEMM stack + masks from an ALREADY-PACKED weight
    [3,3,3,P*Cin,P*Cout] (pack_conv_weights output), lane-padded to 128
    multiples. Shared by prepare_merged and the training forward (where wp
    is a traced value that differentiates through pack_conv_weights)."""
    fy, fx = int(factors[0]), int(factors[1])
    wm = merged_weights_from_packed(wp, (fy, fx))
    pc, pcout = wm.shape[-2], wm.shape[-1]
    cp = -(-pc // 128) * 128
    coutp = -(-pcout // 128) * 128
    wm = jnp.pad(wm, ((0, 0), (0, 0), (0, cp - pc), (0, coutp - pcout)))
    my, px = phase_masks((fy, fx), cin, in_groups)
    my = np.pad(my, (0, cp - pc))
    px = np.pad(px, (0, cp - pc))
    # [8, cp] f32: sublane-tiled so the kernel's row read is layout-native
    return {"wm": wm, "my": np.broadcast_to(my, (8, cp)).copy(),
            "mx": np.broadcast_to(px, (8, cp)).copy(),
            "scheme": "22" if (fy, fx) == (2, 2) else "12",
            "pcout": pcout}


def prepare_merged(w: jax.Array, factors, in_groups=None, *,
                   dtype=None) -> dict:
    """Weight-side transform, to be run OUTSIDE device tile loops (like the
    dense prepare): canonical (3,3,3,Cin,Cout) -> merged GEMM stack + masks,
    lane-padded to 128 multiples."""
    from multitalent_tpu.ops.packed_conv import pack_conv_weights
    fy, fx = int(factors[0]), int(factors[1])
    wp = pack_conv_weights(w, (fy, fx), in_groups)
    prep = _prep_from_packed(wp, (fy, fx), w.shape[3], in_groups)
    if dtype is not None:
        prep["wm"] = prep["wm"].astype(dtype)
    return prep


def merged_train_enabled() -> bool:
    """Merged-tap TRAINING forward (custom_vjp, dense backward).
    MTTPU_MERGED_TRAIN forces on/off; defaults to the inference gate."""
    import os
    val = os.environ.get("MTTPU_MERGED_TRAIN")
    if val is not None:
        return val != "0"
    return merged_conv_enabled()


_TRAIN_INTERPRET = False  # test hook: interpret-mode primal on CPU


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv3d_same_merged_train(x, wp, factors, cin: int, in_groups):
    """Training forward through the merged-tap kernel: computes the SAME
    function as the dense packed conv (SAME conv of x with wp) with 12 GEMMs
    instead of 27; the backward rides the dense formulation (Pallas dx/wgrad
    kernels via the same vjp rules as conv3d_same_fast), so gradients are
    exact w.r.t. the conv math. factors/cin/in_groups are hashable statics
    (mask geometry)."""
    return pallas_packed_conv3d_merged(
        x, _prep_from_packed(wp, factors, cin, in_groups),
        interpret=_TRAIN_INTERPRET)


def _mt_fwd(x, wp, factors, cin, in_groups):
    return conv3d_same_merged_train(x, wp, factors, cin, in_groups), (x, wp)


def merged_bwd_enabled() -> bool:
    """Merged-tap backward (dx through the merged kernel with the
    reversed-transposed packed taps; wgrad through the merged operands —
    12 GEMMs each instead of 27). MTTPU_MERGED_BWD=1 opts in; default OFF
    until the hardware A/B (scripts/merged_train_ab.py) adjudicates it."""
    import os
    return os.environ.get("MTTPU_MERGED_BWD") == "1"


def _merged_bwd(x, wp, g, factors, cin, in_groups):
    """Merged-formulation backward. Raises ValueError when the site doesn't
    qualify (callers fall back to the dense-formulation backward).

    dx: the packed conv is literally a SAME 3^3 conv on the packed grid, so
    dL/dx = SAME-conv(g, taps reversed + transposed) — the transposed tap
    table keeps the phase-block disjointness AND the select rule (a packed
    tap at offset -1 has blocks only at phase-1 rows; its transpose at
    offset +1... -1 likewise), so the forward merged kernel runs it
    unchanged with masks built from g's (phase-major, single-group) lane
    layout.

    dwp: d(wm)[dz, group] = merged_operand^T @ g (12 GEMMs); the group sum's
    VJP broadcasts each group's grad to its member taps. Off-block entries
    of that broadcast differ from the dense conv's free-parameter wgrad,
    but they are exactly the VJP of the merged primal AND the upstream
    pack_conv_weights VJP reads only in-block entries, where the two agree
    (each operand lane carries its phase's own tap shift)."""
    if tuple(factors) != (2, 2):
        raise ValueError("merged backward requires (2,2) packing")
    p = 4
    pc, pcout = wp.shape[-2], wp.shape[-1]
    if pc > 128 or pcout > 128:
        raise ValueError("merged backward requires single-K-tile lanes")
    cout = pcout // p
    wdx = jnp.swapaxes(wp[::-1, ::-1, ::-1], 3, 4)
    dx = pallas_packed_conv3d_merged(
        g, _prep_from_packed(wdx, factors, cout, None),
        interpret=_TRAIN_INTERPRET)
    dwm = pallas_packed_merged_wgrad(x, g, factors, cin, in_groups,
                                     interpret=_TRAIN_INTERPRET)
    dwp = _dwp_from_dwm(dwm)[:, :, :, :pc, :pcout]
    return dx.astype(x.dtype), dwp.astype(wp.dtype)


def _mt_bwd(factors, cin, in_groups, res, g):
    from multitalent_tpu.ops import pallas_conv as pcv
    x, wp = res
    g = g.astype(x.dtype)
    if merged_bwd_enabled():
        try:
            return _merged_bwd(x, wp, g, factors, cin, in_groups)
        except ValueError:
            pass
    try:
        dx = pcv.conv3d_same_dx(g, wp)
    except ValueError:
        _, vjp_x = jax.vjp(lambda xv: pcv._ref_conv(xv, wp), x)
        (dx,) = vjp_x(g)
    if pcv._pallas_wgrad_enabled():
        try:
            return dx, pcv.pallas_conv3d_same_wgrad(x, g).astype(wp.dtype)
        except ValueError:
            pass
    _, vjp_w = jax.vjp(lambda wv: pcv._ref_conv(x, wv), wp)
    (dw,) = vjp_w(g)
    return dx, dw


conv3d_same_merged_train.defvjp(_mt_fwd, _mt_bwd)


# tap (dy, dx) -> merged group index (see merged_weights_from_packed):
# 0 center, 1 y-edges, 2 x-edges, 3 corners
_GIDX = np.asarray([[3, 1, 3], [2, 0, 2], [3, 1, 3]], np.int64)


def _dwp_from_dwm(dwm: jax.Array) -> jax.Array:
    """[3, 4, C, Cout] merged-group wgrad -> [3, 3, 3, C, Cout] packed-tap
    wgrad: each tap receives its group's grad (the group sum's VJP)."""
    return dwm[:, _GIDX.reshape(-1)].reshape(
        3, 3, 3, dwm.shape[-2], dwm.shape[-1])


def _merged_wgrad_kernel(x_ref, g_ref, my_ref, mx_ref, out_ref, xblk, sems,
                         *, bz, by, bx, c, cout, zb, yb, xb):
    """d(wm)[dz, group] = merged_operand^T @ g: 12 [C, M] x [M, Cout] GEMMs
    per block (vs the dense wgrad's 27), accumulated into a VMEM-resident
    fp32 [3, 4, C, Cout] across the sequential grid. The operands are the
    SAME per-lane selects of shifted halo views the forward merged kernel
    builds (pallas_conv._wgrad_kernel is the dense analog)."""
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
        pltpu.make_async_copy(
            x_ref.at[ii // zb, pl.ds(jax.lax.rem(ii, zb) * bz, bz + 2),
                     pl.ds(jj * by, by + 2), pl.ds(kk * bx, bx + 16), :],
            xblk.at[slot], sems.at[slot]).start()

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

    M = bz * by * bx
    gs = g_ref[0].reshape(M, cout)

    def body(xy, xxh, xc):
        my = (my_ref[0, :] > 0.5).reshape(1, 1, 1, c)
        mx = (mx_ref[0, :] > 0.5).reshape(1, 1, 1, c)
        xv = xblk[slot]
        xy[:] = jnp.where(my, xv[:, 0:by, 8:8 + bx, :],
                          xv[:, 2:by + 2, 8:8 + bx, :])
        xxh[:] = jnp.where(mx, xv[:, :, 7:7 + bx, :],
                           xv[:, :, 9:9 + bx, :])
        xc[:] = jnp.where(my, xxh[:, 0:by], xxh[:, 2:by + 2])
        for dz in range(3):
            ops = (xv[dz:dz + bz, 1:1 + by, 8:8 + bx, :],
                   xy[dz:dz + bz],
                   xxh[dz:dz + bz, 1:1 + by],
                   xc[dz:dz + bz])
            for gi, op in enumerate(ops):
                out_ref[dz, gi] += jax.lax.dot_general(
                    op.reshape(M, c), gs, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

    pl.run_scoped(body,
                  pltpu.VMEM((bz + 2, by, bx, c), xblk.dtype),
                  pltpu.VMEM((bz + 2, by + 2, bx, c), xblk.dtype),
                  pltpu.VMEM((bz + 2, by, bx, c), xblk.dtype))


@lru_cache(maxsize=32)
def _build_merged_wgrad(n, z, y, x, c, cout, dtype_name, bz, by, bx,
                        interpret=False):
    dtype = jnp.dtype(dtype_name)
    zb = z // bz
    yb = y // by
    xb = x // bx
    grid = (n * zb, yb, xb)
    kernel = partial(_merged_wgrad_kernel, bz=bz, by=by, bx=bx, c=c,
                     cout=cout, zb=zb, yb=yb, xb=xb)
    flops = 2 * 12 * c * cout * n * z * y * x

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # padded x, manual DMA
            pl.BlockSpec((1, bz, by, bx, cout),
                         lambda i, j, k, zb=zb: (i // zb, i % zb, j, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # py mask [8, c]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # px mask [8, c]
        ],
        out_specs=pl.BlockSpec((3, 4, c, cout), lambda i, j, k: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 4, c, cout), jnp.float32),
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
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)}),
    )


def pallas_packed_merged_wgrad(x_packed, g, factors, cin: int, in_groups=None,
                               *, interpret: bool = False):
    """Merged-group weight gradient of the (2,2) packed SAME conv:
    x (N,Z,Y,X,P*Cin), cotangent g (N,Z,Y,X,P*Cout) -> [3, 4, P*Cin, P*Cout]
    fp32 (z-tap, merged group). Raises ValueError when the shape is
    unsupported (callers fall back to the dense wgrad)."""
    if tuple(factors) != (2, 2):
        raise ValueError("merged wgrad requires (2,2) packing")
    n, z, y, xdim, pc = x_packed.shape
    ng, zg, yg, xg, pcout = g.shape
    if (ng, zg, yg, xg) != (n, z, y, xdim):
        raise ValueError("shape mismatch")
    if not interpret and jax.default_backend() != "tpu":
        raise ValueError("pallas merged conv requires a TPU backend")
    from multitalent_tpu.ops.pallas_conv import _pick_blocks
    blocks = _pick_blocks(z, y, xdim)
    if blocks is None:
        raise ValueError("unsupported shape")
    bz, by, bx = blocks
    cp = -(-pc // 128) * 128
    coutp = -(-pcout // 128) * 128
    my, px = phase_masks(factors, cin, in_groups)
    my = np.pad(my, (0, cp - pc))
    px = np.pad(px, (0, cp - pc))
    xpad = jnp.pad(x_packed, ((0, 0), (1, 1), (1, 1), (8, 8), (0, cp - pc)))
    gp = jnp.pad(g, ((0, 0),) * 4 + ((0, coutp - pcout),)) \
        if coutp != pcout else g
    call = _build_merged_wgrad(n, z, y, xdim, cp, coutp, str(x_packed.dtype),
                               bz, by, bx, interpret)
    dwm = call(xpad, gp.astype(x_packed.dtype),
               jnp.asarray(np.broadcast_to(my, (8, cp)).copy()),
               jnp.asarray(np.broadcast_to(px, (8, cp)).copy()))
    return dwm[:, :, :pc, :pcout]


def pallas_packed_conv3d_merged(x_packed: jax.Array, prepared: dict, *,
                                interpret: bool = False) -> jax.Array:
    """Run the merged-tap conv from prepare_merged arrays. Raises ValueError
    on unsupported shapes (callers fall back to the dense path)."""
    from multitalent_tpu.ops.pallas_conv import _pick_blocks
    n, z, y, xdim, pc = x_packed.shape
    if not interpret and jax.default_backend() != "tpu":
        raise ValueError("pallas merged conv requires a TPU backend")
    blocks = _pick_blocks(z, y, xdim)
    if blocks is None:
        raise ValueError("unsupported shape")
    bz, by, bx = blocks
    cp = -(-pc // 128) * 128
    pcout = prepared["pcout"]
    coutp = -(-pcout // 128) * 128
    wm = prepared["wm"]
    if wm.shape[-2] != cp or wm.shape[-1] != coutp:
        raise ValueError("prepared weights do not match input lanes")
    xpad = jnp.pad(x_packed, ((0, 0), (1, 1), (1, 1), (8, 8), (0, cp - pc)))
    call = _build(n, z, y, xdim, cp, coutp, str(x_packed.dtype), bz, by, bx,
                  prepared["scheme"], interpret)
    out = call(xpad, wm.astype(x_packed.dtype),
               jnp.asarray(prepared["my"]), jnp.asarray(prepared["mx"]))
    return out[..., :pcout] if coutp != pcout else out
