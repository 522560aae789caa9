"""Measure per-grid-step overhead of pallas kernels on this TPU.

Two experiments at CONSTANT total work/output:
  zeros:  output-only kernel writing the same 96^3 x 128 bf16 tensor with
          block (8,16,16) [grid 432] vs (8,32,48) [grid 72]
  conv27: the center-view 27-dot kernel (manual halo DMA, same math) with
          block (8,16,16) [432] vs (8,32,32) [108]

If wall time tracks grid size at fixed work, the kernel is bound by per-step
overhead (DMA latency stall / sequencer), not MXU or bandwidth — and
production block sizes should grow until VMEM-bound.
Usage: python scripts/grid_overhead_probe.py [iters]
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from multitalent_tpu.configuration import enable_compilation_cache
    enable_compilation_cache()

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    dev = jax.devices()[0]
    print(f"# device={dev}", flush=True)
    rng = np.random.RandomState(0)
    z = y = x = 96
    c = 128

    def time_fn(name, fn, *args):
        jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(iters):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            ts.append(time.time() - t0)
        print(f"{name}: {np.median(ts)*1e3:.2f} ms", flush=True)

    # ---- zeros kernel: BlockSpec-driven output only
    def zeros_kernel(out_ref):
        out_ref[...] = jnp.zeros_like(out_ref)

    for bz, by, bx in ((8, 16, 16), (8, 32, 48), (96, 96, 96)):
        zb, yb, xb = z // bz, y // by, x // bx
        call = pl.pallas_call(
            zeros_kernel,
            grid=(zb, yb, xb),
            out_specs=pl.BlockSpec((bz, by, bx, c),
                                   lambda i, j, k: (i, j, k, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((z, y, x, c), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        time_fn(f"zeros grid={zb*yb*xb} block=({bz},{by},{bx})",
                jax.jit(lambda f=call: f()))

    # ---- conv kernel, center-view dots, two block sizes
    def conv_kernel(x_ref, w_ref, out_ref, xblk, sems, *, bz, by, bx,
                    zb, yb, xb, ndots):
        i = pl.program_id(0)
        j = pl.program_id(1)
        k = pl.program_id(2)
        g = (i * yb + j) * xb + k
        n_steps = zb * yb * xb
        slot = jax.lax.rem(g, 2)

        def start_fetch(step, slot):
            kk = jax.lax.rem(step, xb)
            jj = jax.lax.rem(step // xb, yb)
            ii = step // (xb * yb)
            dma = pltpu.make_async_copy(
                x_ref.at[0, pl.ds(ii * bz, bz + 2),
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

        pltpu.make_async_copy(
            x_ref.at[0, pl.ds(0, bz + 2), pl.ds(0, by + 2),
                     pl.ds(0, bx + 16), :],
            xblk.at[slot], sems.at[slot]).wait()

        M = bz * by * bx

        def body(acc):
            acc[:] = jnp.zeros_like(acc)
            a2 = xblk[slot, 1:1 + bz, 1:1 + by, 8:8 + bx, :].reshape(M, c)
            for t in range(ndots):
                acc[:] += jnp.dot(a2, w_ref[t % 3, (t // 3) % 3, t % 3],
                                  preferred_element_type=jnp.float32)
            out_ref[0] = acc[:].reshape(bz, by, bx, c).astype(out_ref.dtype)

        pl.run_scoped(body, pltpu.VMEM((M, c), jnp.float32))

    xpad = jax.device_put(jnp.asarray(
        rng.randn(1, z + 2, y + 2, x + 16, c).astype(np.float32)).astype(
            jnp.bfloat16), dev)
    wref = jnp.asarray(rng.randn(3, 3, 3, c, c).astype(np.float32) * .05
                       ).astype(jnp.bfloat16)

    for bz, by, bx, ndots in ((8, 16, 16, 27), (8, 32, 32, 27),
                              (8, 48, 96, 27), (8, 32, 32, 12),
                              (8, 48, 96, 12)):
        zb, yb, xb = z // bz, y // by, x // bx
        call = pl.pallas_call(
            partial(conv_kernel, bz=bz, by=by, bx=bx, zb=zb, yb=yb, xb=xb,
                    ndots=ndots),
            grid=(zb, yb, xb),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, bz, by, bx, c),
                                   lambda i, j, k: (0, i, j, k, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, z, y, x, c), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((2, bz + 2, by + 2, bx + 16, c), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        time_fn(f"conv{ndots} grid={zb*yb*xb} block=({bz},{by},{bx})",
                jax.jit(lambda a, f=call: f(a, wref)))


if __name__ == "__main__":
    main()
