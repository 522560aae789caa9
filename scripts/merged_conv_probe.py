"""Hardware A/B: merged-tap conv (ops/pallas_merged_conv.py) vs the dense
tap-GEMM conv on the flagship packed stage shapes. Run solo (1-core host).

Usage: python scripts/merged_conv_probe.py [iters]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _probe_merged2(dev, iters, rng):
    """dec0 concat conv as the two-input merged kernel vs dense grouped
    (which also pays the concat the two-input kernel skips)."""
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.ops.packed_conv import pack_conv_weights
    from multitalent_tpu.ops.pallas_conv import conv3d_same_fast
    from multitalent_tpu.ops.pallas_merged_conv import (
        pallas_packed_conv3d_merged2, prepare_merged2)

    dims = (96, 96, 96)
    a = jax.device_put(jnp.asarray(
        rng.randn(1, *dims, 120).astype(np.float32)).astype(jnp.bfloat16),
        dev)
    b = jax.device_put(jnp.asarray(
        rng.randn(1, *dims, 120).astype(np.float32)).astype(jnp.bfloat16),
        dev)
    w = jnp.asarray(rng.randn(3, 3, 3, 60, 30).astype(np.float32) * .1)
    wp = pack_conv_weights(w, (2, 2), (30, 30)).astype(jnp.bfloat16)
    dense = jax.jit(lambda u, s, wp=wp: conv3d_same_fast(
        jnp.concatenate([u, s], axis=-1), wp))
    prep = prepare_merged2(w, (2, 2), (30, 30), dtype=jnp.bfloat16)
    merged = jax.jit(lambda u, s, p=prep:
                     pallas_packed_conv3d_merged2(u, s, p))

    ref = np.asarray(dense(a, b), np.float32)
    got = np.asarray(merged(a, b), np.float32)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"m2 dec0 pair: parity rel={rel:.3e}", flush=True)
    out = {}
    for label, fn in (("dense+concat", dense), ("merged2", merged)):
        o = fn(a, b)
        float(jnp.asarray(o).ravel()[0])
        t0 = time.time()
        for _ in range(iters):
            o = fn(a, b)
        float(jnp.asarray(o).ravel()[0])
        out[label] = (time.time() - t0) / iters * 1e3
    print(f"m2 dec0 pair: dense+concat {out['dense+concat']:.2f} ms  "
          f"merged2 {out['merged2']:.2f} ms  speedup "
          f"{out['dense+concat']/out['merged2']:.2f}x", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.configuration import enable_compilation_cache
    enable_compilation_cache()
    from multitalent_tpu.ops.packed_conv import pack_conv_weights
    from multitalent_tpu.ops.pallas_conv import conv3d_same_fast
    from multitalent_tpu.ops.pallas_merged_conv import (
        prepare_merged, pallas_packed_conv3d_merged)

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    dev = jax.devices()[0]
    print(f"# device={dev}", flush=True)
    rng = np.random.RandomState(0)

    if not only or "m2" in only:
        _probe_merged2(dev, iters, rng)

    # flagship shapes: stage0 conv (2,2), dec0 concat conv (2,2) grouped,
    # stage1 conv (1,2)
    cases = [
        ("s0 (2,2) 30->30", (2, 2), 30, 30, None, (96, 96, 96)),
        ("dec0 (2,2) 60->30 grp", (2, 2), 60, 30, (30, 30), (96, 96, 96)),
        ("s1 (1,2) 60->60", (1, 2), 60, 60, None, (48, 96, 48)),
    ]
    for name, factors, cin, cout, in_groups, dims in cases:
        if only and only not in name:
            continue
        p = factors[0] * factors[1]
        x = jax.device_put(jnp.asarray(
            rng.randn(1, *dims, p * cin).astype(np.float32)).astype(
                jnp.bfloat16), dev)
        w = jnp.asarray(rng.randn(3, 3, 3, cin, cout).astype(np.float32) * .1)

        wp = pack_conv_weights(w, factors, in_groups).astype(jnp.bfloat16)
        dense = jax.jit(lambda a, wp=wp: conv3d_same_fast(a, wp))
        prep = prepare_merged(w, factors, in_groups, dtype=jnp.bfloat16)
        prep = {k: (jax.device_put(jnp.asarray(v), dev)
                    if hasattr(v, "shape") else v) for k, v in prep.items()}
        merged = jax.jit(lambda a, prep=prep:
                         pallas_packed_conv3d_merged(a, prep))

        ref = np.asarray(dense(x), np.float32)
        got = np.asarray(merged(x), np.float32)
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"{name}: parity rel={rel:.3e}", flush=True)

        out = {}
        for label, fn in (("dense", dense), ("merged", merged)):
            # block_until_ready returns immediately on the axon relay: time a
            # queue of `iters` enqueues and sync via ONE host fetch of the
            # last output (the device stream is in-order)
            o = fn(x)
            float(jnp.asarray(o).ravel()[0])  # drain
            t0 = time.time()
            for _ in range(iters):
                o = fn(x)
            float(jnp.asarray(o).ravel()[0])
            out[label] = (time.time() - t0) / iters * 1e3
        print(f"{name}: dense {out['dense']:.2f} ms  merged "
              f"{out['merged']:.2f} ms  speedup "
              f"{out['dense']/out['merged']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
