"""Measure device->host link bandwidth and the RLE run counts the bench
phantom actually produces at a given volume shape.

Usage: python scripts/link_probe.py [z y x]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    dims = (tuple(int(a) for a in sys.argv[1:4])
            if len(sys.argv) >= 4 else (192, 256, 256))
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.configuration import enable_compilation_cache
    enable_compilation_cache()
    from bench import _phantom_volume
    from scripts.sw_arms import build_predictor
    from multitalent_tpu.ops.sliding_window import (
        _rle_count, _rle_count_first, _pack_words_from_bits, _RLE_BUCKETS)

    dev = jax.devices()[0]
    # link bandwidth: 8 MiB fetch, 3 times
    buf = jax.device_put(jnp.arange(2 * 1024 * 1024, dtype=jnp.uint32), dev)
    np.asarray(buf[:1024])
    for _ in range(3):
        t0 = time.time()
        np.asarray(buf)
        dt = time.time() - t0
        print(f"# link d->h: 8 MiB in {dt:.2f} s = {8/dt:.1f} MB/s", flush=True)

    predictor, params = build_predictor(dev)
    vol = _phantom_volume(dims)
    t0 = time.time()
    bits_dev, slicer = predictor.predict_to_device(params, vol,
                                                   pack_threshold=0.5,
                                                   pack_bits=True)
    jax.block_until_ready(bits_dev)
    cf = np.asarray(_rle_count_first(jnp.ravel(bits_dev)))
    print(f"# predict+count {time.time()-t0:.1f} s", flush=True)
    k, z, y, x = bits_dev.shape
    n = k * z * y * x
    bucket = next((b for b in _RLE_BUCKETS if b >= int(cf[0])), None)
    print(f"# bits: shape {bits_dev.shape} runs {int(cf[0])} "
          f"({int(cf[0])/n*100:.2f}% of {n}) bucket {bucket} "
          f"transfer {(bucket or 0)*4/1e6:.1f} MB", flush=True)
    # per-class run counts (where is the density?)
    flat_k = bits_dev.reshape(k, -1)
    counts = [int(_rle_count(flat_k[i])) for i in range(k)]
    print(f"# per-class runs: min {min(counts)} median "
          f"{sorted(counts)[k//2]} max {max(counts)} sum {sum(counts)}",
          flush=True)
    frac = [float(jnp.mean(flat_k[i].astype(jnp.float32))) for i in range(k)]
    print(f"# per-class fg fraction: min {min(frac):.3f} median "
          f"{sorted(frac)[k//2]:.3f} max {max(frac):.3f}", flush=True)
    words = _pack_words_from_bits(bits_dev)
    wcounts = [int(_rle_count(jnp.ravel(words[..., i])))
               for i in range(words.shape[-1])]
    print(f"# word-path runs/plane: {wcounts} "
          f"(transfer ~{sum(min(b for b in _RLE_BUCKETS if b >= c) * 8 for c in wcounts)/1e6:.1f} MB)",
          flush=True)


if __name__ == "__main__":
    main()
