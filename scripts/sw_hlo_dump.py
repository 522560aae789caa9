"""Dump the optimized HLO of the sliding-window step program (flagship config).

Usage: XLA_FLAGS="--xla_dump_to=/tmp/hlo_sw --xla_dump_hlo_as_text" \
       python scripts/sw_hlo_dump.py

Compiles exactly the program bench.py measures (flipw arm, packed layout,
device loop) and runs one volume so every jit in the path materializes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import bench
    device = jax.devices()[0]
    bench._force_plain_convs_off_tpu(True)
    from multitalent_tpu.ops.sliding_window import SlidingWindowPredictor
    from multitalent_tpu.ops.packed_unet import (make_inference_apply_fn,
                                                 make_packed_inference_apply_fn)
    from __graft_entry__ import _flagship_model
    model = _flagship_model()
    patch = (96, 192, 192)
    example = jax.device_put(jnp.zeros((1, *patch, 1)), device)
    params = jax.jit(model.init)(
        jax.device_put(jax.random.PRNGKey(0), device), example)["params"]
    apply_fn = make_inference_apply_fn(model)
    pfn, pfac = make_packed_inference_apply_fn(model, patch)
    predictor = SlidingWindowPredictor(
        apply_fn, patch, in_channels=1, num_classes=47, nonlin="sigmoid",
        step_size=0.5, do_mirroring=True, mirror_axes=(0, 1, 2),
        use_gaussian=True, device=device, packed_apply=(pfn, pfac))
    vol = bench._phantom_volume((256, 320, 320))
    t0 = time.time()
    out, slicer = predictor.predict_to_device(params, vol, pack_threshold=0.5)
    jax.block_until_ready(out)
    print(f"one volume (compile+run): {time.time() - t0:.1f} s", flush=True)


if __name__ == "__main__":
    main()
