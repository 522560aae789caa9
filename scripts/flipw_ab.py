"""A/B the flip-in-weights TTA path vs activation flips at bench scale.

Usage: python scripts/flipw_ab.py [flipw|actflip] [repeats]
Run each arm in its OWN process (env gates are read at trace time).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    arm = sys.argv[1] if len(sys.argv) > 1 else "flipw"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.environ["MTTPU_SW_FLIPW"] = "1" if arm == "flipw" else "0"
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.ops.sliding_window import SlidingWindowPredictor
    from multitalent_tpu.ops.packed_unet import (
        make_inference_apply_fn, make_packed_inference_apply_fn)
    from __graft_entry__ import _flagship_model
    from bench import _phantom_volume

    dev = jax.devices()[0]
    print(f"# arm={arm} device={dev}", flush=True)
    model = _flagship_model()
    patch = (96, 192, 192)
    volume_shape = (256, 320, 320)
    example = jax.device_put(jnp.zeros((1, *patch, 1)), dev)
    params = jax.jit(model.init)(jax.device_put(jax.random.PRNGKey(0), dev),
                                 example)["params"]
    apply_fn = make_inference_apply_fn(model)
    pfn, pfac = make_packed_inference_apply_fn(model, patch)
    predictor = SlidingWindowPredictor(
        apply_fn, patch, in_channels=1, num_classes=47, nonlin="sigmoid",
        step_size=0.5, do_mirroring=True, mirror_axes=(0, 1, 2),
        use_gaussian=True, device=dev, packed_apply=(pfn, pfac))
    vol = _phantom_volume(volume_shape)

    t0 = time.time()
    packed_dev, slicer = predictor.predict_to_device(params,
                                                     volume_czyx=vol,
                                                     pack_threshold=0.5)
    jax.block_until_ready(packed_dev)
    print(f"# warmup (compile+run): {time.time()-t0:.1f} s", flush=True)

    times = []
    for i in range(n):
        t0 = time.time()
        packed_dev, slicer = predictor.predict_to_device(params,
                                                         volume_czyx=vol,
                                                         pack_threshold=0.5)
        jax.block_until_ready(packed_dev)
        dt = time.time() - t0
        times.append(dt)
        print(f"repeat {i}: {dt:.2f} s  ({60/dt:.3f} vol/min)", flush=True)
    med = float(np.median(times))
    print(f"RESULT arm={arm} median={med:.2f}s vol/min={60/med:.3f} "
          f"best={min(times):.2f}s", flush=True)


if __name__ == "__main__":
    main()
