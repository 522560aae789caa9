"""Measured-loser conv-kernel A/B arms, preserved as a scripts-level harness.

These inner-loop strategies for the packed stride-1 3x3x3 conv were built and
adjudicated on v5e hardware (documentation/performance_notes.md):

- 'sum'    chained-accumulation expression          (round 1: ~= 'tap')
- 'im2col' [M, 27c] VMEM materialization            (round 1: loses)
- 'wino'   Winograd F(2x2x2,3x3x3)                  (round 3: 24.0 vs 10.7 ms, 2.2x loss)
- 'tap3'   x-taps folded into K ([M,3c]x[3c,cout])  (round 3: loses to 'tap')

The production kernel (ops/pallas_conv.py) keeps only the winning 'tap'
schedule; this file preserves the losers verbatim for re-measurement when the
hardware/toolchain changes.

Usage: python scripts/conv_impl_arms.py [impl ...]   (default: all)
Runs an interpret-mode parity check and, on TPU, a timed A/B at the flagship
packed stage-0 shape.
"""
import sys
import time
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _impl_choice() -> str:
    """Kernel inner-loop strategy: 'tap' (27 accumulating dots, the round-1
    baseline), 'sum' (single accumulation expression), 'im2col' (materialize
    [M, 27c] in VMEM, one long-K GEMM). Compile-time: part of the build key."""
    import os
    return os.environ.get("MTTPU_PALLAS_CONV_IMPL", "tap")


def _conv_kernel(x_ref, w_ref, out_ref, xblk, sems, *, bz, by, bx, c, cout,
                 zb, yb, xb, impl="tap"):
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

    if impl == "wino":
        # Winograd F(2x2x2, 3x3x3): 8/27 the MXU work of the direct conv.
        # Weights arrive pre-transformed as [64, c, cout] (G w G^T per axis,
        # host-side). Data transform B^T and inverse transform A^T are adds
        # only; the 64 transform-domain GEMMs run staged per (a, b) pair with
        # the inverse accumulated on the fly, so at most ~20 [M_b, c] arrays
        # are live at once.
        #
        # Mosaic cannot lower strided slices (they become gathers), so all
        # stride-2 phase picks are expressed as even-split reshapes + static
        # indexing: free on the major z/y dims; on the sublane x dim one
        # deinterleave relayout up front replaces the 16 strided slices.
        hz, hy, hx = bz // 2, by // 2, bx // 2
        mb = hz * hy * hx
        xv = xblk[slot]

        def bt(v):
            # B^T rows: (1,0,-1,0), (0,1,1,0), (0,-1,1,0), (0,1,0,-1)
            return [v[0] - v[2], v[1] + v[2], v[2] - v[1], v[1] - v[3]]

        def phase_slices(arr, axis, half_len):
            """arr split along `axis` (even length) into stride-2 phase views:
            returns s[q] == arr.take(range(q, q+2*half_len, 2), axis) for
            q in 0..3, via reshape (..., L/2, 2, ...) + static index/slice."""
            shp = arr.shape
            view = arr.reshape(shp[:axis] + (shp[axis] // 2, 2)
                               + shp[axis + 1:])
            out = []
            for q in range(4):
                sl = [slice(None)] * view.ndim
                sl[axis] = slice(q // 2, q // 2 + half_len)
                sl[axis + 1] = q % 2
                out.append(view[tuple(sl)])
            return out

        # z-pass: 4 arrays [hz, by+2, bx+16, c]
        t1 = bt(phase_slices(xv, 0, hz))
        # y-pass: 16 arrays [hz, hy, bx+16, c]
        t2 = [bt(phase_slices(ta, 1, hy)) for ta in t1]

        at_rows = ((1.0, 1.0, 1.0, 0.0), (0.0, 1.0, -1.0, -1.0))
        acc = {}
        for a in range(4):
            for b in range(4):
                # x-pass: deinterleave sublanes once ([.., bx+16, c] ->
                # [.., (bx+16)/2, 2, c]), then static phase picks. The +-1
                # halo sits at offset 7..bx+9, so pick xc starts at sublane
                # 7+xc = pair (7+xc)//2, phase (7+xc)%2.
                xs = t2[a][b].reshape(hz, hy, (bx + 16) // 2, 2, c)
                t3 = bt([xs[:, :, (7 + xc) // 2:(7 + xc) // 2 + hx,
                            (7 + xc) % 2] for xc in range(4)])
                for cc in range(4):
                    idx = (a * 4 + b) * 4 + cc
                    yab = jnp.dot(t3[cc].reshape(mb, c), w_ref[idx],
                                  preferred_element_type=jnp.float32)
                    for pz in range(2):
                        ca = at_rows[pz][a]
                        if ca == 0.0:
                            continue
                        for py in range(2):
                            cb = at_rows[py][b]
                            if cb == 0.0:
                                continue
                            for px in range(2):
                                cw = at_rows[px][cc]
                                if cw == 0.0:
                                    continue
                                coeff = ca * cb * cw
                                term = yab if coeff == 1.0 else -yab
                                key = (pz, py, px)
                                acc[key] = (term if key not in acc
                                            else acc[key] + term)
        # interleave the 2x2x2 output phases back into the block
        rows = [acc[(pz, py, px)].reshape(hz, hy, hx, cout)
                for pz in range(2) for py in range(2) for px in range(2)]
        stacked = jnp.stack(rows).reshape(2, 2, 2, hz, hy, hx, cout)
        out = stacked.transpose(3, 0, 4, 1, 5, 2, 6).reshape(bz, by, bx, cout)
        out_ref[0] = out.astype(out_ref.dtype)
    elif impl == "im2col":
        # Materialize the full im2col matrix [M, 27*c] in VMEM (27 shifted
        # block copies), then ONE [M, 27c] x [27c, cout] GEMM: K = 27*128 =
        # 3456 streams the systolic array continuously instead of 27
        # fill/drain cycles with an accumulator read-modify-write per tap.
        def body(a):
            for dz in range(3):
                for dy in range(3):
                    for dx in range(3):
                        t = (dz * 3 + dy) * 3 + dx
                        xs = xblk[slot, dz:dz + bz, dy:dy + by,
                                  dx + 7:dx + 7 + bx, :]
                        a[:, t * c:(t + 1) * c] = xs.reshape(bz * by * bx, c)
            out = jnp.dot(a[:], w_ref[:].reshape(27 * c, cout),
                          preferred_element_type=jnp.float32)
            out_ref[0] = out.reshape(bz, by, bx, cout).astype(out_ref.dtype)

        pl.run_scoped(body, pltpu.VMEM((bz * by * bx, 27 * c), xblk.dtype))
    elif impl == "tap3":
        # Fold the 3 x-taps into the GEMM K dimension: build an
        # x-concatenated copy of the block ONCE (3 sublane-shifted copies,
        # one of which — dx=1 at offset 8 — is aligned), then run 9 (dz, dy)
        # GEMMs of [M, 3c] x [3c, cout]. The plain tap impl's 27 per-tap
        # slices each carry a sublane rotation (x offsets 7/8/9) whose VPU
        # cost rivals the 27 small matmuls; this cuts the rotations 9x and
        # triples the K each MXU weight-load amortizes. Weights arrive
        # pre-reshaped as [3, 3, 3c, cout] (dx-major, ci-minor — matching
        # the xcat channel order).
        def body(acc, xcat):
            for dx in range(3):
                xcat[:, :, :, dx * c:(dx + 1) * c] = (
                    xblk[slot, :, :, dx + 7:dx + 7 + bx, :])
            acc[:] = jnp.zeros_like(acc)
            for dz in range(3):
                for dy in range(3):
                    xs = xcat[dz:dz + bz, dy:dy + by, :, :]
                    a2 = xs.reshape(bz * by * bx, 3 * c)
                    acc[:] += jnp.dot(a2, w_ref[dz, dy, :, :],
                                      preferred_element_type=jnp.float32)
            out_ref[0] = acc[:].reshape(bz, by, bx, cout).astype(
                out_ref.dtype)

        pl.run_scoped(body,
                      pltpu.VMEM((bz * by * bx, cout), jnp.float32),
                      pltpu.VMEM((bz + 2, by + 2, bx, 3 * c), xblk.dtype))
    elif impl == "sum":
        # accumulate as one expression: lets Mosaic chain the 27 dots through
        # the MXU accumulator instead of a VMEM read-modify-write per tap
        out = None
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    xs = xblk[slot, dz:dz + bz, dy:dy + by,
                              dx + 7:dx + 7 + bx, :]
                    a2 = xs.reshape(bz * by * bx, c)
                    d = jnp.dot(a2, w_ref[dz, dy, dx, :, :],
                                preferred_element_type=jnp.float32)
                    out = d if out is None else out + d
        out_ref[0] = out.reshape(bz, by, bx, cout).astype(out_ref.dtype)
    else:
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
def _build(n, z, y, x, c, cout, dtype_name, bz, by, bx, interpret=False,
           impl="tap"):
    dtype = jnp.dtype(dtype_name)
    zb = z // bz
    yb = y // by
    xb = x // bx
    grid = (n * zb, yb, xb)
    kernel = partial(_conv_kernel, bz=bz, by=by, bx=bx, c=c, cout=cout,
                     zb=zb, yb=yb, xb=xb, impl=impl)
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
        # tap3's extra [bz+2, by+2, bx, 3c] xcat scratch overflows the 16 MB
        # default scoped-vmem budget at the widest (C=320->384) stages
        **({"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)}
           if impl == "tap3" and not interpret else {}),
    )


def _pick_blocks(z, y, x, impl="tap"):
    """Block sizes dividing the spatial dims, sized for ~1 MB VMEM blocks
    ('tap'/'sum') or ~0.5 MB ('im2col', whose [M, 27c] scratch is 27x the
    block — M must stay ~1024 to fit VMEM)."""
    def best(dim, targets):
        for t in targets:
            if dim % t == 0:
                return t
        return None
    if impl == "wino":
        # block dims must be even (2^3 output tiles); bx also 16-aligned
        bz = best(z, (8, 6, 4, 2))
        by = best(y, (16, 12, 8, 6, 4, 2))
        bx = best(x, (16, 32, 8, 24))
        if None in (bz, by, bx):
            return None
        return bz, by, bx
    bz = best(z, (4, 8, 2) if impl == "im2col" else (8, 6, 4, 12, 2))
    by = best(y, (16, 12, 8, 6, 4) if impl == "im2col"
              else (16, 12, 24, 8, 6, 4))
    # bx must be a multiple of 8: HBM->VMEM DMA windows start at kk*bx in the
    # sublane (x) dim and sublane slice starts must be 8-aligned — the +8
    # pre-pad only yields aligned windows when bx % 8 == 0 (bx=12 would
    # compile-fail in Mosaic with no fallback).
    bx = best(x, (8, 16) if impl == "im2col" else (16, 8, 24))
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
    impl = _impl_choice()
    blocks = _pick_blocks(z, y, xdim, impl)
    if blocks is None:
        raise ValueError("unsupported shape")
    bz, by, bx = blocks
    cp = -(-c // 128) * 128
    coutp = -(-cout // 128) * 128
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (8, 8), (0, cp - c)))
    wp = jnp.pad(w, ((0, 0),) * 3 + ((0, cp - c), (0, coutp - cout)))
    if impl == "wino":
        # pre-transform the weights: wt[abc] = (G x G x G) w, [64, cp, coutp]
        g = jnp.asarray([[1.0, 0.0, 0.0], [0.5, 0.5, 0.5],
                         [0.5, -0.5, 0.5], [0.0, 0.0, 1.0]], jnp.float32)
        wt = jnp.einsum("au,bv,cw,uvwio->abcio", g, g, g,
                        wp.astype(jnp.float32))
        wp = wt.reshape(64, cp, coutp)
    elif impl == "tap3":
        # [3, 3, 3, cp, coutp] -> [3, 3, 3*cp, coutp], dx-major ci-minor
        wp = wp.reshape(3, 3, 3 * cp, coutp)
    call = _build(n, z, y, xdim, cp, coutp, str(x.dtype), bz, by, bx,
                  interpret, impl)
    out = call(xpad, wp.astype(x.dtype))
    return out[..., :cout] if coutp != cout else out




def main():
    impls = sys.argv[1:] or ["tap", "sum", "im2col", "tap3", "wino"]
    rng = np.random.default_rng(0)
    # parity (interpret, small)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 16, 120)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 120, 120)), jnp.float32) * .1
    pad = (((1, 1),) * 3)
    ref = lax.conv_general_dilated(
        x, w, (1, 1, 1), pad, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    for impl in impls:
        os.environ["MTTPU_PALLAS_CONV_IMPL"] = impl
        out = pallas_conv3d_same(x, w, interpret=True)
        err = float(jnp.abs(out - ref).max())
        print(f"{impl:7s} interpret parity maxerr {err:.2e}")
        assert err < 1e-3, impl
    if jax.devices()[0].platform != "tpu":
        print("no TPU: skipping the timed A/B")
        return
    xb = jnp.asarray(rng.standard_normal((2, 96, 96, 96, 120)), jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    for impl in impls:
        os.environ["MTTPU_PALLAS_CONV_IMPL"] = impl
        f = jax.jit(lambda a, b: pallas_conv3d_same(a, b))
        try:
            for _ in range(2):
                np.asarray(f(xb, wb).ravel()[:1])
            t0 = time.time()
            for _ in range(10):
                out = f(xb, wb)
            np.asarray(out.ravel()[:1])
            print(f"{impl:7s} {(time.time() - t0) / 10 * 1e3:7.2f} ms/conv")
        except Exception as e:
            print(f"{impl:7s} FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
