"""Engine-level hardware parity: full sliding-window predict (mirror TTA in
weights, packed accumulation) with the merged-tap conv vs the dense tap conv.

Each arm runs in its own trace env (gates read at trace time), same process.
Usage: python scripts/merged_engine_check.py [z y x]   (volume, default small)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.configuration import enable_compilation_cache
    enable_compilation_cache()
    from multitalent_tpu.models.generic_unet import GenericUNet
    from multitalent_tpu.ops.packed_unet import (
        make_inference_apply_fn, make_packed_inference_apply_fn)
    from multitalent_tpu.ops.sliding_window import SlidingWindowPredictor

    dims = (tuple(int(a) for a in sys.argv[1:4])
            if len(sys.argv) >= 4 else (128, 224, 224))
    dev = jax.devices()[0]
    print(f"# device={dev} vol={dims}", flush=True)

    pools = (((2, 2, 2),) * 4 + ((1, 2, 2),))
    model = GenericUNet(input_channels=1, base_num_features=30,
                        num_classes=47, pool_op_kernel_sizes=pools,
                        conv_kernel_sizes=((3, 3, 3),) * 6,
                        deep_supervision=False, dtype=jnp.bfloat16)
    patch = (96, 192, 192)
    params = jax.jit(model.init)(
        jax.device_put(jax.random.PRNGKey(0), dev),
        jax.device_put(jnp.zeros((1, *patch, 1)), dev))["params"]
    vol = np.random.RandomState(3).randn(1, *dims).astype(np.float32)

    import time
    outs = {}
    for arm, env in (("dense", "0"), ("merged", "1")):
        os.environ["MTTPU_PALLAS_MERGED"] = env
        apply_fn = make_inference_apply_fn(model)
        pfn, pfac = make_packed_inference_apply_fn(model, patch)
        pred = SlidingWindowPredictor(
            apply_fn, patch, in_channels=1, num_classes=47, nonlin="sigmoid",
            step_size=0.5, do_mirroring=True, mirror_axes=(0, 1, 2),
            use_gaussian=True, device=dev,
            packed_apply=(pfn, pfac) if pfn is not None else None)
        t0 = time.time()
        outs[arm] = np.asarray(pred(params, vol), np.float32)
        print(f"# {arm} done ({time.time()-t0:.1f} s incl. compile)",
              flush=True)
    os.environ.pop("MTTPU_PALLAS_MERGED", None)

    d, m = outs["dense"], outs["merged"]
    diff = np.abs(d - m)
    print(f"prob maxdiff {diff.max():.4g}  meandiff {diff.mean():.4g}")
    # bf16 forward + f16 TTA sums: pointwise probabilities match to the same
    # rounding class the dense kernel itself carries
    decided = np.abs(d - 0.5) > 5e-3
    flips = ((d > 0.5) != (m > 0.5)) & decided
    print(f"decided voxels {decided.mean():.4f}  "
          f"threshold flips among decided {flips.mean():.3e}")
    assert diff.mean() < 2e-3, diff.mean()
    assert flips.mean() < 1e-4, flips.mean()
    print("ENGINE PARITY OK")


if __name__ == "__main__":
    main()
