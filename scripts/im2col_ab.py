"""A/B the tiny-cin packed conv site (stage-0 block0: [2,96,96,96,4] -> 120)
between XLA's conv lowering and the explicit im2col GEMM, queue-timed, with
output parity. Decides MTTPU_IM2COL_MAX_K (27*4=108 sat above the old 64
threshold and ran as a 6.4 ms XLA conv — 8 TTA combos made that 1.17 s of
the bench volume)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.configuration import enable_compilation_cache
    enable_compilation_cache()
    from multitalent_tpu.ops.packed_conv import (apply_packed_conv3d,
                                                 prepare_packed_conv3d)

    dev = jax.devices()[0]
    rs = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(
        rs.randn(2, 96, 96, 96, 4).astype(np.float32), jnp.bfloat16), dev)
    w = jnp.asarray(rs.randn(3, 3, 3, 1, 30).astype(np.float32) * 0.2)

    outs = {}
    for arm, maxk in (("conv", "0"), ("im2col", "128")):
        os.environ["MTTPU_IM2COL_MAX_K"] = maxk
        prep = prepare_packed_conv3d(w.astype(jnp.bfloat16), x.shape,
                                     factors=(2, 2))
        print(f"# {arm}: kind={prep['kind']}", flush=True)
        fn = jax.jit(lambda xv, p=prep: apply_packed_conv3d(xv, p))
        out = fn(x)
        np.asarray(out[0, 0, 0, 0])
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            out = fn(x)
        np.asarray(out[0, 0, 0, 0])  # one fetch drains the queue
        dt = (time.time() - t0) / iters
        outs[arm] = (dt, np.asarray(out, np.float32))
        print(f"{arm:8s} {dt*1e3:7.2f} ms", flush=True)
    os.environ.pop("MTTPU_IM2COL_MAX_K", None)

    (dt_c, o_c), (dt_i, o_i) = outs["conv"], outs["im2col"]
    err = np.abs(o_c - o_i).max() / (np.abs(o_c).max() + 1e-9)
    print(f"speedup {dt_c/dt_i:.2f}x  maxrel {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
