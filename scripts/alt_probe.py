"""Decompose per-volume time at an arbitrary volume shape into its phases.

The round-4 bench showed the flagship (256,320,320) at 1.096x baseline but
the alt shape (192,256,256) at 0.794x: a 12-tile volume amortizes per-volume
fixed costs over 1/4 the work of the 45-tile flagship. This probe measures,
per repeat, each serialized phase of the pipelined loop bench.py runs:

  count_sync  time in rle_fetch_begin (previous volume's run-count fetches —
              serialized BEFORE the next compute dispatch)
  dispatch    host time in predict_to_device (runner build + acc zeros +
              loop/finalize dispatch, all async on device)
  put         host time in begin_put (pad + fp16 cast + device_put enqueue)
  overlap     rle_fetch_finish + unpack_class_bits (host work that overlaps
              device compute in wall-clock)
  drain       remaining block_until_ready wait (device compute not hidden
              by the host work above)

Usage: python scripts/alt_probe.py [z y x] [-r N]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    argv = [a for a in sys.argv[1:]]
    reps = 5
    if "-r" in argv:
        i = argv.index("-r")
        reps = int(argv[i + 1])
        del argv[i:i + 2]
    dims = tuple(int(a) for a in argv[:3]) if len(argv) >= 3 else (192, 256, 256)

    import jax
    from multitalent_tpu.configuration import enable_compilation_cache
    enable_compilation_cache()
    from bench import _phantom_volume
    from scripts.sw_arms import build_predictor
    from multitalent_tpu.ops.sliding_window import (bits_fetch_begin,
                                                    bits_fetch_finish)

    dev = jax.devices()[0]
    predictor, params = build_predictor(dev)
    vol = _phantom_volume(dims)
    coords = predictor.tile_coords([max(s, p) for s, p in
                                    zip(dims, predictor.patch_size)])
    print(f"# device={dev} vol={dims} tiles={len(coords)}", flush=True)

    # warmup (compile + one full pass incl. fetch)
    t0 = time.time()
    out = predictor.predict_regions_packed(params, vol)
    print(f"# warmup {time.time()-t0:.2f} s", flush=True)

    pending = None
    next_put = predictor.begin_put(vol)
    rows = []
    for rep in range(reps + 1):
        t0 = time.time()
        token = bits_fetch_begin(pending[0]) if pending is not None else None
        prev_slicer = pending[1] if pending is not None else None
        pending = None  # free the 1.2 GB-class uint8 masks before dispatch
        t1 = time.time()
        packed_dev, slicer = predictor.predict_to_device(
            params, preput=next_put, pack_threshold=0.5, pack_bits=True)
        t2 = time.time()
        next_put = predictor.begin_put(vol)
        t3 = time.time()
        if token is not None:
            bits_fetch_finish(token)[(slice(None),) + tuple(prev_slicer)]
        t4 = time.time()
        pending = (packed_dev, slicer)
        jax.block_until_ready(packed_dev)
        t5 = time.time()
        if rep > 0:
            rows.append((t1 - t0, t2 - t1, t3 - t2, t4 - t3, t5 - t4,
                         t5 - t0))
            print(f"rep {rep}: count_sync {t1-t0:6.3f}  dispatch {t2-t1:6.3f}"
                  f"  put {t3-t2:6.3f}  overlap {t4-t3:6.3f}"
                  f"  drain {t5-t4:6.3f}  total {t5-t0:6.3f}", flush=True)

    # steady-state: volume resident, no fetch in the window
    token = predictor.begin_put(vol)
    steady = []
    out = None
    for _ in range(3):
        del out  # free the previous result before the next dispatch
        t0 = time.time()
        out, _ = predictor.predict_to_device(params, preput=token,
                                             pack_threshold=0.5,
                                             pack_bits=True)
        jax.block_until_ready(out)
        # real sync: fetch one word (block_until_ready can return early on
        # the relay; a scalar fetch cannot)
        np.asarray(out[0, 0, 0, 0])
        steady.append(time.time() - t0)
    arr = np.array(rows)
    names = ["count_sync", "dispatch", "put", "overlap", "drain", "total"]
    med = np.median(arr, axis=0)
    print("# medians: " + "  ".join(f"{n}={v:.3f}" for n, v in
                                    zip(names, med)), flush=True)
    print(f"# steady_state per-volume: {[round(s,3) for s in steady]} "
          f"(min {min(steady):.3f})", flush=True)
    print(f"# per-tile steady: {min(steady)/len(coords)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
