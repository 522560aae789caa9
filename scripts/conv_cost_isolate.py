"""Isolate the cost structure of the packed tap-GEMM conv on hardware.

Variants (identical DMA pipeline + output write; b/c/d have WRONG numerics —
this measures cost, not correctness):
  dense27  - production kernel: 27 taps, per-tap shifted slices
  center27 - 27 dots, all on ONE aligned center view (no per-tap slicing)
  center12 - 12 dots on the center view (GEMM-count scaling alone)
  merged12 - the merged-tap kernel (selects + scratch + 12 GEMMs)

Deltas: dense27-center27 = per-tap slice/relayout cost; center27/center12 =
MXU GEMM-count scaling; merged12-center12 = select/scratch overhead.
Usage: python scripts/conv_cost_isolate.py [iters]
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
    from multitalent_tpu.ops.packed_conv import pack_conv_weights
    from multitalent_tpu.ops.pallas_conv import conv3d_same_fast
    from multitalent_tpu.ops.pallas_merged_conv import (
        prepare_merged, pallas_packed_conv3d_merged)

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    dev = jax.devices()[0]
    print(f"# device={dev}", flush=True)
    rng = np.random.RandomState(0)

    z = y = x = 96
    c = 128
    bz, by, bx = 8, 16, 16
    zb, yb, xb = z // bz, y // by, x // bx
    n = 1
    M = bz * by * bx

    def centern_kernel(x_ref, w_ref, out_ref, xblk, sems, *, ndots):
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

        pltpu.make_async_copy(
            x_ref.at[0, pl.ds(0, bz + 2), pl.ds(0, by + 2),
                     pl.ds(0, bx + 16), :],
            xblk.at[slot], sems.at[slot]).wait()

        def body(acc):
            acc[:] = jnp.zeros_like(acc)
            xs = xblk[slot, 1:1 + bz, 1:1 + by, 8:8 + bx, :]
            a2 = xs.reshape(M, c)
            for t in range(ndots):
                acc[:] += jnp.dot(a2, w_ref[t % 3, (t // 3) % 3, t % 3],
                                  preferred_element_type=jnp.float32)
            out_ref[0] = acc[:].reshape(bz, by, bx, c).astype(out_ref.dtype)

        pl.run_scoped(body, pltpu.VMEM((M, c), jnp.float32))

    def build_center(ndots):
        return pl.pallas_call(
            partial(centern_kernel, ndots=ndots),
            grid=(n * zb, yb, xb),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (1, bz, by, bx, c),
                lambda i, j, k: (i // zb, i % zb, j, k, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, z, y, x, c), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((2, bz + 2, by + 2, bx + 16, c), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

    xinp = jax.device_put(jnp.asarray(
        rng.randn(n, z, y, x, 120).astype(np.float32)).astype(jnp.bfloat16),
        dev)
    w = jnp.asarray(rng.randn(3, 3, 3, 30, 30).astype(np.float32) * .1)
    wp = pack_conv_weights(w, (2, 2)).astype(jnp.bfloat16)
    wp128 = jnp.pad(wp, ((0, 0),) * 3 + ((0, 8), (0, 8)))
    xpad = jnp.pad(xinp, ((0, 0), (1, 1), (1, 1), (8, 8), (0, 8)))

    prep = prepare_merged(w, (2, 2), None, dtype=jnp.bfloat16)

    # bandwidth / MXU reference probes (same timing protocol)
    big = jax.device_put(jnp.ones((96, 96, 96, 128), jnp.bfloat16), dev)
    mm = jax.device_put(jnp.ones((8192, 8192), jnp.bfloat16), dev)
    arms = {
        "add216MiB": (jax.jit(lambda a: a + 1), big),
        "matmul8192": (jax.jit(lambda a: a @ a), mm),
        "dense27": (jax.jit(lambda a: conv3d_same_fast(a, wp)), xinp),
        "center27": (jax.jit(lambda a, f=build_center(27): f(a, wp128)),
                     xpad),
        "center12": (jax.jit(lambda a, f=build_center(12): f(a, wp128)),
                     xpad),
        "merged12": (jax.jit(
            lambda a, p=prep: pallas_packed_conv3d_merged(a, p)), xinp),
    }

    def fetch(o):
        # block_until_ready returns immediately on the axon relay — the ONLY
        # reliable sync is a host fetch of data derived from the output
        return float(jnp.asarray(o).ravel()[0])

    for name, (fn, arg) in arms.items():
        fetch(fn(arg))  # compile + drain
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = fn(arg)
        fetch(out)  # queue is in-order: fetching the last output syncs all
        dt = (time.time() - t0) / iters
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
