"""Block-sparse tap-GEMM conv for space-to-depth packed stages.

MEASURED-LOSER A/B ARM (evicted from the package, round 5): on v5e the
in-kernel lane gathers lower as full-block relayout copies and the kernel
loses to the dense 27-tap kernel (22.3 vs 12.7 ms on the stage-0-class conv;
documentation/performance_notes.md "block-sparse tap kernel"). Its winning
rework — merge only taps with disjoint lanes so ZERO lanes move — lives in
ops/pallas_merged_conv.py and is the production path. Kept here as a
standalone harness (run this file directly for the interpret-mode parity
check) for future re-adjudication on other TPU generations.

The dense packed conv (ops/packed_conv.py) trades FLOPs for MXU shape: packing
(fy, fx) phases into lanes multiplies the 3x3x3 conv's FLOPs by P = fy*fx
because the packed weight is block-sparse — each packed tap's [P*C, P*C]
matrix has only some (input-phase -> output-phase) blocks nonzero. The dense
tap kernel (ops/pallas_conv.py) pays for all of them.

This kernel exploits the sparsity structure directly. In packed coordinates
the 27 taps split into:

  (2,2) packing (stage 0, C=30 -> 120):  per z-tap (3 of them)
    - center (oy=ox=1):       all 16 phase blocks nonzero -> 1 dense GEMM
    - y-edges (oy in {0,2}):  4 blocks each; the two taps touch DISJOINT
      input phases (py=1 of the y-1 cell / py=0 of the y+1 cell) and disjoint
      output phases -> ONE GEMM on a lane-gathered input       (2 taps -> 1)
    - x-edges:                same structure along x            (2 taps -> 1)
    - corners (4 taps):       1 block each, all disjoint -> ONE GEMM on a
      4-way lane-gathered input                                 (4 taps -> 1)
    Total: 12 GEMMs instead of 27 (1.33x the original FLOPs instead of 4x).

  (1,2) packing (stage 1, C=60 -> 120): per (z,y)-tap (9 of them)
    - x-center: dense -> 1 GEMM;  x-edges: 2 taps -> 1 gathered GEMM
    Total: 18 GEMMs instead of 27.

The lane gathers concatenate phase sub-ranges of differently-shifted halo
windows. To keep every gather a lane-rotation at a 32-multiple boundary, the
kernel works in a PHASE-PADDED lane layout: each phase's channels are padded
to cpp = ceil(c/32)*32 lanes, so phase p occupies lanes [p*cpp, (p+1)*cpp).
The (cheap, fused) pre-pad that the dense kernel already performs
(120 -> 128 lanes + halo) becomes a phase-interleaved pad here — same traffic.
Output is written in the TIGHT phase-major layout (P*Cout lanes), so callers
(packed_instance_norm etc.) are unchanged.

Decoder concat inputs (packed_conv3d's in_groups) are regrouped to phase-major
inside the same pre-pad, so the first decoder convs qualify too.

Forward-only, like the dense kernel: backward rides XLA's conv via the
caller's custom_vjp. Reference for the op being computed:
nnunet/network_architecture/generic_UNet.py:28-144 (ConvDropoutNormNonlin
stacks); the schedule is TPU-native with no reference analog.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cpp(c: int) -> int:
    return -(-c // 32) * 32


def _phase_pad_channels(x, p: int, c: int, cpp: int, in_groups=None):
    """(.., P*c) tight phase-major (or plain group concat [P*g0 | P*g1 ...])
    -> (.., P*cpp) phase-padded phase-major. One fused gather/copy in XLA."""
    if in_groups is None:
        in_groups = (c,)
    parts = []
    pad = cpp - c
    zeros = None
    for ph in range(p):
        for gi, g in enumerate(in_groups):
            base = sum(in_groups[:gi]) * p
            parts.append(lax.slice_in_dim(x, base + ph * g, base + (ph + 1) * g,
                                          axis=x.ndim - 1))
        if pad:
            if zeros is None:
                zeros = jnp.zeros(x.shape[:-1] + (pad,), x.dtype)
            parts.append(zeros)
    return jnp.concatenate(parts, axis=-1)


def _sparse_weights(w, factors, cpp: int, in_groups=None):
    """Canonical (3, 3, 3, Cin, Cout) weights -> [3, G, P*cpp, P*Cout] merged
    GEMM matrices (numpy/jnp; runs at trace time on tiny tensors).

    G and the per-GEMM input layouts match the kernel's gathers:
      (2,2): G=4: [center, y-edge, x-edge, corner]
      (1,2): G=6: [(dy=0 center-x), (dy=0 edge-x), (dy=1 ...), (dy=2 ...)]
    """
    fy, fx = int(factors[0]), int(factors[1])
    p = fy * fx
    kz, ky, kx, cin, cout = w.shape
    assert (kz, ky, kx) == (3, 3, 3)
    if in_groups is None:
        in_groups = (cin,)
    c = cin  # channels per phase (sum of groups)
    # per-phase channel layout inside cpp: groups concatenated then zero pad
    # (matches _phase_pad_channels)

    G = 4 if (fy, fx) == (2, 2) else (6 if (fy, fx) == (1, 2) else None)
    assert G is not None, factors
    out = jnp.zeros((3, G, p * cpp, p * cout), w.dtype)

    def blk(g, dz, dy, dx, pin, qout):
        """Set w[dz,dy,dx] into GEMM matrix (dz, g) at input phase pin
        (gathered slot), output phase qout (tight cout-major). Builds with
        jnp .at[].set() so traced (e.g. TTA tap-reversed) weights work."""
        nonlocal out
        out = out.at[dz, g, pin * cpp:pin * cpp + c,
                     qout * cout:(qout + 1) * cout].set(w[dz, dy, dx])

    if (fy, fx) == (2, 2):
        def phase(py, px):
            return py * 2 + px
        for dz in range(3):
            for py in range(2):
                for px in range(2):
                    for qy in range(2):
                        for qx in range(2):
                            blk(0, dz, 1 + py - qy, 1 + px - qx,
                                phase(py, px), phase(qy, qx))
            # y-edge gathered slots: [py=1 phases of y-1 | py=0 phases of y+1]
            # slot s in 0..3 -> (src py, px) = (1, s) for s<2 else (0, s-2)
            for s in range(4):
                py, px = (1, s) if s < 2 else (0, s - 2)
                dy = 0 if s < 2 else 2
                qy = 0 if s < 2 else 1
                for qx in range(2):
                    dx = 1 + px - qx
                    if 0 <= dx <= 2:
                        blk(1, dz, dy, dx, s, phase(qy, qx))
            # x-edge gathered slots (built by +-cpp lane rotations):
            # [p1@x-1, p0@x+1, p3@x-1, p2@x+1]
            for s, (py, px, dx, qx) in enumerate(
                    [(0, 1, 0, 0), (0, 0, 2, 1), (1, 1, 0, 0), (1, 0, 2, 1)]):
                for qy in range(2):
                    dy = 1 + py - qy
                    if 0 <= dy <= 2:
                        blk(2, dz, dy, dx, s, phase(qy, qx))
            # corner gathered slots: [p3@(y-1,x-1), p2@(y-1,x+1),
            #                         p1@(y+1,x-1), p0@(y+1,x+1)]
            for s, (dy, dx, qy, qx) in enumerate(
                    [(0, 0, 0, 0), (0, 2, 0, 1), (2, 0, 1, 0), (2, 2, 1, 1)]):
                blk(3, dz, dy, dx, s, phase(qy, qx))
    else:  # (1, 2)
        for dz in range(3):
            for dy in range(3):
                # x-center: dense over the 2 x-phases
                for px in range(2):
                    for qx in range(2):
                        dx = 1 + px - qx
                        blk(2 * dy, dz, dy, dx, px, qx)
                # x-edge gathered: [px=1 of x-1 | px=0 of x+1]
                blk(2 * dy + 1, dz, dy, 0, 0, 0)
                blk(2 * dy + 1, dz, dy, 2, 1, 1)
    return out


def _sparse_kernel(x_ref, w_ref, out_ref, xblk, sems, *, bz, by, bx, kin,
                   cout_p, zb, yb, xb, factors, cpp):
    """Grid/DMA scaffolding identical to pallas_conv._conv_kernel (haloed
    block double-buffered HBM->VMEM); inner loop runs the merged sparse-tap
    GEMMs on lane-gathered inputs."""
    fy, fx = factors
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

    m = bz * by * bx
    pc = kin  # P * cpp lanes
    lane_axis = 3

    def body(acc):
        acc[:] = jnp.zeros_like(acc)
        xv = xblk[slot]

        def dot_acc(a, wt):
            acc[:] += jnp.dot(a.reshape(m, kin), wt,
                              preferred_element_type=jnp.float32)

        def lane_iota(shape):
            return jax.lax.broadcasted_iota(jnp.int32, shape, lane_axis)

        def gather2(a, b, half):
            """[lanes half.. of a | lanes 0..half of b] without a lane
            concat: Mosaic's concat rule rejects operands whose sublane (x
            slice) offsets differ ("offset mismatch on non-concat
            dimension"); roll + select carries no such constraint."""
            # jnp.roll, not pltpu.roll: Mosaic's tpu.rotate rejects bf16
            # ("Rotate with non-32-bit data"); jnp.roll lowers as matching-
            # offset slice+concat of the SAME operand, which it accepts
            ar = jnp.roll(a, pc - half, lane_axis)  # == roll(-half)
            br = jnp.roll(b, half, lane_axis)
            return jnp.where(lane_iota(a.shape) < half, ar, br)

        for dz in range(3):
            if (fy, fx) == (2, 2):
                # center
                dot_acc(xv[dz:dz + bz, 1:1 + by, 8:8 + bx, :], w_ref[dz, 0])
                # y-edge gather: [lanes 2cpp:4cpp of y-1 | 0:2cpp of y+1]
                ye = gather2(xv[dz:dz + bz, 0:by, 8:8 + bx, :],
                             xv[dz:dz + bz, 2:2 + by, 8:8 + bx, :], 2 * cpp)
                dot_acc(ye, w_ref[dz, 1])
                # x-edge gather: slots [p1@x-1, p0@x+1, p3@x-1, p2@x+1] —
                # px=1 sub-blocks of x-1 move down one phase slot (roll -cpp),
                # px=0 of x+1 move up one (roll +cpp); alternate 32-lane slots
                xm = jnp.roll(xv[dz:dz + bz, 1:1 + by, 7:7 + bx, :],
                              pc - cpp, lane_axis)
                xp = jnp.roll(xv[dz:dz + bz, 1:1 + by, 9:9 + bx, :],
                              cpp, lane_axis)
                li = lane_iota(xm.shape)
                xe = jnp.where((li // cpp) % 2 == 0, xm, xp)
                dot_acc(xe, w_ref[dz, 2])
                # corner gather: [p3@(y-1,x-1), p2@(y-1,x+1),
                #                 p1@(y+1,x-1), p0@(y+1,x+1)]
                c00 = jnp.roll(xv[dz:dz + bz, 0:by, 7:7 + bx, :],
                               pc - 3 * cpp, lane_axis)
                c02 = jnp.roll(xv[dz:dz + bz, 0:by, 9:9 + bx, :],
                               pc - cpp, lane_axis)
                c20 = jnp.roll(xv[dz:dz + bz, 2:2 + by, 7:7 + bx, :],
                               cpp, lane_axis)
                c22 = jnp.roll(xv[dz:dz + bz, 2:2 + by, 9:9 + bx, :],
                               3 * cpp, lane_axis)
                slot_i = li // cpp
                cg = jnp.where(slot_i == 0, c00,
                               jnp.where(slot_i == 1, c02,
                                         jnp.where(slot_i == 2, c20, c22)))
                dot_acc(cg, w_ref[dz, 3])
            else:  # (1, 2)
                for dy in range(3):
                    dot_acc(xv[dz:dz + bz, dy:dy + by, 8:8 + bx, :],
                            w_ref[dz, 2 * dy])
                    xe = gather2(xv[dz:dz + bz, dy:dy + by, 7:7 + bx, :],
                                 xv[dz:dz + bz, dy:dy + by, 9:9 + bx, :],
                                 cpp)
                    dot_acc(xe, w_ref[dz, 2 * dy + 1])
        out_ref[0] = acc[:].reshape(bz, by, bx, cout_p).astype(out_ref.dtype)

    pl.run_scoped(body, pltpu.VMEM((m, cout_p), jnp.float32))


@lru_cache(maxsize=32)
def _build_sparse(n, z, y, x, kin, cout_p, ng, dtype_name, bz, by, bx,
                  factors, cpp, interpret=False):
    dtype = jnp.dtype(dtype_name)
    zb = z // bz
    yb = y // by
    xb = x // bx
    grid = (n * zb, yb, xb)
    kernel = partial(_sparse_kernel, bz=bz, by=by, bx=bx, kin=kin,
                     cout_p=cout_p, zb=zb, yb=yb, xb=xb, factors=factors,
                     cpp=cpp)
    flops = 2 * 3 * ng * kin * cout_p * n * z * y * x

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # padded input, DMA'd
            pl.BlockSpec(memory_space=pltpu.VMEM),  # merged GEMM weights
        ],
        out_specs=pl.BlockSpec(
            (1, bz, by, bx, cout_p),
            lambda i, j, k, zb=zb: (i // zb, i % zb, j, k, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, z, y, x, cout_p), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bz + 2, by + 2, bx + 16, kin), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(n * (z + 2) * (y + 2) * (x + 16) * kin * 2
                            + n * z * y * x * cout_p * 2),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )


def sparse_conv_enabled() -> bool:
    """Opt-in (MTTPU_PALLAS_SPARSE=1): measured v5e, the roll/select lane
    gathers cost ~4x the GEMMs they feed (stage0 conv 22.3 vs dense 12.7 ms)
    — Mosaic lowers jnp.roll/select chains as multiple full-block relayouts.
    Kept for the gather-free rework (XLA-side gather tensors); see
    documentation/performance_notes.md round 4."""
    import os
    return os.environ.get("MTTPU_PALLAS_SPARSE") == "1"


def _pick_blocks(z, y, x):
    def best(dim, targets):
        for t in targets:
            if dim % t == 0:
                return t
        return None
    bz = best(z, (8, 6, 4, 12, 2))
    by = best(y, (16, 12, 24, 8, 6, 4))
    bx = best(x, (16, 8, 24))
    if None in (bz, by, bx):
        return None
    return bz, by, bx


def pallas_packed_conv3d_sparse(x_packed, w, *, factors, in_groups=None,
                                interpret: bool = False, cin=None,
                                prepared_weights=None):
    """Stride-1 SAME 3x3x3 conv on a packed tensor via merged sparse-tap
    GEMMs. x_packed: (N, Z, Y', X', P*Cin) tight phase-major (or in_groups
    plain concat); w: canonical (3,3,3,Cin,Cout). Returns tight phase-major
    (N, Z, Y', X', P*Cout). Raises ValueError when unsupported (callers fall
    back to the dense path).

    prepared_weights (+ cin): the _sparse_weights output precomputed outside
    a device tile loop (see prepare_packed_conv3d); w may be None then."""
    fy, fx = int(factors[0]), int(factors[1])
    if (fy, fx) not in ((2, 2), (1, 2)):
        raise ValueError("unsupported factors")
    p = fy * fx
    n, z, yp, xp, pc = x_packed.shape
    if prepared_weights is None:
        kz, ky, kx, cin, cout = w.shape
        if (kz, ky, kx) != (3, 3, 3) or p * cin != pc:
            raise ValueError("unsupported kernel")
    else:
        cin = int(cin)
        cout = prepared_weights.shape[-1] // p
        if p * cin != pc:
            raise ValueError("unsupported kernel")
    if not interpret and jax.default_backend() != "tpu":
        raise ValueError("pallas conv requires a TPU backend")
    blocks = _pick_blocks(z, yp, xp)
    if blocks is None:
        raise ValueError("unsupported shape")
    bz, by, bx = blocks
    cpp = _cpp(cin)
    kin = p * cpp
    cout_p = p * cout  # tight output; MXU pads N internally
    ng = 4 if (fy, fx) == (2, 2) else 6

    xg = _phase_pad_channels(x_packed, p, cin, cpp, in_groups)
    xpad = jnp.pad(xg, ((0, 0), (1, 1), (1, 1), (8, 8), (0, 0)))
    wts = (prepared_weights if prepared_weights is not None
           else _sparse_weights(w, (fy, fx), cpp, in_groups))
    wts = wts.astype(x_packed.dtype)
    call = _build_sparse(n, z, yp, xp, kin, cout_p, ng, str(x_packed.dtype),
                         bz, by, bx, (fy, fx), cpp, interpret)
    return call(xpad, wts)


def _parity_check():
    """Interpret-mode parity vs the plain conv in packed space (the test this
    arm carried in tests/test_pallas_ops.py before its eviction)."""
    from multitalent_tpu.ops.packed_conv import space_to_depth_yx

    for factors, c, groups in (((2, 2), 30, None), ((1, 2), 60, None),
                               ((2, 2), 32, (20, 12))):
        rng = np.random.default_rng(3)
        cout = 24
        w = jnp.asarray(rng.standard_normal((3, 3, 3, c, cout)),
                        jnp.float32) * 0.1
        pad = tuple((1, 1) for _ in range(3))
        if groups is None:
            x = jnp.asarray(rng.standard_normal((2, 8, 16, 16, c)), jnp.float32)
            xg = space_to_depth_yx(x, factors)
        else:
            xs = [jnp.asarray(rng.standard_normal((2, 8, 16, 16, g)),
                              jnp.float32) for g in groups]
            x = jnp.concatenate(xs, -1)
            xg = jnp.concatenate([space_to_depth_yx(v, factors) for v in xs],
                                 -1)
        ref = lax.conv_general_dilated(
            x, w, (1, 1, 1), pad,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        ref_p = space_to_depth_yx(ref, factors)
        out = pallas_packed_conv3d_sparse(xg, w, factors=factors,
                                          in_groups=groups, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_p),
                                   atol=1e-4)
        print(f"parity ok factors={factors} c={c} groups={groups}")


if __name__ == "__main__":
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    _parity_check()
