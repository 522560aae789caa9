"""Hardware validation of the round-2 fused kernels on the real TPU.

Compares the default inference forward (packed conv + Pallas tap-GEMM +
fused conv+norm chain + fused seg-head) against the pure-XLA reference path
on the flagship MultiTalent topology, and times both.

Usage: python scripts/hw_validate.py [small|full]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:1])
    return x


def main():
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.configuration import enable_compilation_cache
    enable_compilation_cache()

    size = sys.argv[1] if len(sys.argv) > 1 else "small"
    from __graft_entry__ import _flagship_model
    model = _flagship_model()
    patch = (96, 192, 192) if size == "full" else (48, 96, 96)
    b = 2
    print(f"devices: {jax.devices()}", flush=True)

    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, jnp.zeros((1, *patch, 1)))["params"]
    x = jnp.asarray(np.random.RandomState(0).randn(b, *patch, 1), jnp.bfloat16)

    # pure XLA reference
    ref_fn = jax.jit(lambda p, v: model.apply({"params": p}, v,
                                              deep_supervision=False))
    t0 = time.time()
    ref = sync(ref_fn(params, x))
    print(f"xla compile+run: {time.time()-t0:.1f} s", flush=True)
    ref_np = np.asarray(ref[:, ::16, ::16, ::16, :], np.float32)
    scale = float(np.abs(ref_np).max())

    from multitalent_tpu.ops import packed_unet

    configs = [
        ("packed+tap+fusedchain+seghead (default)", {}),
        ("packed+tap, no fused chain", {"MTTPU_FUSED_NORM": "0"}),
        ("packed+tap, no seghead", {"MTTPU_PALLAS_SEGHEAD": "0"}),
        ("packed only (no pallas)", {"MTTPU_PALLAS_CONV": "0"}),
    ]
    for label, env in configs:
        saved = {}
        for k, v in env.items():
            saved[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            from multitalent_tpu.ops import pallas_conv as pcv
            pcv._build.cache_clear()
            apply_fn = packed_unet.make_inference_apply_fn(model)
            f = jax.jit(lambda p, v: apply_fn(p, v))
            t0 = time.time()
            out = sync(f(params, x))
            compile_s = time.time() - t0
            out_np = np.asarray(out[:, ::16, ::16, ::16, :], np.float32)
            err = float(np.abs(out_np - ref_np).max()) / scale
            # time it
            for _ in range(2):
                out = f(params, x)
            sync(out)
            t0 = time.time()
            n = 6
            for _ in range(n):
                out = f(params, x)
            sync(out)
            dt = (time.time() - t0) / n
            print(f"{label:42s} err={err:.4f} of max|logit|  "
                  f"{dt*1e3:7.1f} ms ({dt/b*1e3:6.1f} ms/sample)  "
                  f"[compile {compile_s:.0f}s]", flush=True)
        except Exception as e:
            print(f"{label:42s} FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


if __name__ == "__main__":
    main()
