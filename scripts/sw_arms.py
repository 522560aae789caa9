"""Interleaved multi-arm A/B of sliding-window engine variants at bench scale.

Usage: python scripts/sw_arms.py "name1:ENV=V,ENV2=V2" "name2:..." [-r ROUNDS]

Each arm builds its own predictor with its env gates set (gates are read at
trace time), warms up once, then timed volumes round-robin across arms —
interleaving controls for the relay's bandwidth/latency drift, which spreads
identical work by >1.3x across repeats (round-2 bench data).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_predictor(dev):
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.ops.sliding_window import SlidingWindowPredictor
    from multitalent_tpu.ops.packed_unet import (
        make_inference_apply_fn, make_packed_inference_apply_fn)
    from __graft_entry__ import _flagship_model
    from bench import _calibrate_head_bias, _phantom_volume
    model = _flagship_model()
    patch = (96, 192, 192)
    example = jax.device_put(jnp.zeros((1, *patch, 1)), dev)
    params = jax.jit(model.init)(
        jax.device_put(jax.random.PRNGKey(0), dev), example)["params"]
    apply_fn = make_inference_apply_fn(model)
    # production-like sparse masks (see bench._calibrate_head_bias): probes
    # must exercise the same transport the bench measures
    params = _calibrate_head_bias(model, params, apply_fn, patch, dev,
                                  _phantom_volume((patch[0], patch[1],
                                                   patch[2])))
    pfn, pfac = make_packed_inference_apply_fn(model, patch)
    predictor = SlidingWindowPredictor(
        apply_fn, patch, in_channels=1, num_classes=47, nonlin="sigmoid",
        step_size=0.5, do_mirroring=True, mirror_axes=(0, 1, 2),
        use_gaussian=True, device=dev, packed_apply=(pfn, pfac))
    return predictor, params


def main():
    argv = sys.argv[1:]
    rounds = 3
    if "-r" in argv:
        i = argv.index("-r")
        rounds = int(argv[i + 1])
        del argv[i:i + 2]
    args = argv
    arms = []
    for spec in args:
        name, _, envs = spec.partition(":")
        env = dict(kv.split("=", 1) for kv in envs.split(",") if kv)
        arms.append((name, env))

    import jax
    from multitalent_tpu.configuration import enable_compilation_cache
    enable_compilation_cache()
    from bench import _phantom_volume
    dev = jax.devices()[0]
    vol = _phantom_volume((256, 320, 320))
    print(f"# device={dev} arms={[a[0] for a in arms]}", flush=True)

    built = []
    base_env = dict(os.environ)
    for name, env in arms:
        os.environ.clear()
        os.environ.update(base_env)
        os.environ.update(env)
        t0 = time.time()
        try:
            predictor, params = build_predictor(dev)
            # one put per arm, reused across rounds: the ~52 MB f16 volume
            # transfer over the relay (~4-6 s) would otherwise be timed inside
            # every round, swamping chip-side A/B deltas (bench.py pipelines
            # this transfer; here we exclude it entirely)
            preput = predictor.begin_put(vol)
            out, _ = predictor.predict_to_device(params, preput=preput,
                                                 pack_threshold=0.5)
            jax.block_until_ready(out)
        except Exception as e:  # a crashed arm must not kill the others
            print(f"# arm {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        print(f"# arm {name}: warmup (compile+run) {time.time()-t0:.1f} s",
              flush=True)
        built.append((name, env, predictor, params, preput))
    os.environ.clear()
    os.environ.update(base_env)

    times = {name: [] for name, *_ in built}
    for r in range(rounds):
        for name, env, predictor, params, preput in built:
            os.environ.update(env)  # harmless post-compile; matches trace env
            t0 = time.time()
            out, _ = predictor.predict_to_device(params, preput=preput,
                                                 pack_threshold=0.5)
            jax.block_until_ready(out)
            dt = time.time() - t0
            times[name].append(dt)
            print(f"round {r} {name:12s} {dt:6.2f} s", flush=True)
            for k in env:
                if k not in base_env:
                    os.environ.pop(k, None)
    print("# === medians ===", flush=True)
    for name in times:
        ts = sorted(times[name])
        med = ts[len(ts) // 2]
        print(f"RESULT {name:12s} median={med:.2f}s best={ts[0]:.2f}s "
              f"vol/min={60/med:.3f}", flush=True)


if __name__ == "__main__":
    main()
