"""TPU microbenchmarks for the conv kernel work (run solo — 1-core host).

Usage: python scripts/perf_probe.py [probe ...]
Probes: impls fwd stages
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    # On the axon relay block_until_ready returns immediately; only a host
    # fetch actually waits for the computation. Fetch one element (the full
    # buffer would crawl at ~8 MB/s device->host).
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:1])
    return x


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / n


def probe_impls():
    """Packed-stage conv (flagship stage0 shape) under each kernel impl."""
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.ops import pallas_conv as pcv

    n, z, y, x, c = 2, 96, 96, 96, 120
    rng = np.random.RandomState(0)
    xin = jnp.asarray(rng.randn(n, z, y, x, c), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.05, jnp.bfloat16)
    flops = 2 * 27 * c * c * n * z * y * x

    def chained(xv, wv, f):
        # chain 4 convs so per-dispatch overhead amortizes
        for _ in range(4):
            xv = f(xv, wv)
        return xv

    for impl in ("tap", "sum", "im2col"):
        os.environ["MTTPU_PALLAS_CONV_IMPL"] = impl
        pcv._build.cache_clear()
        f = jax.jit(lambda a, b: chained(a, b, pcv.pallas_conv3d_same))
        try:
            dt = timeit(f, xin, w, n=8) / 4
            print(f"impl={impl:7s} {dt*1e3:7.2f} ms/conv  "
                  f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"impl={impl:7s} FAILED: {type(e).__name__} {e}", flush=True)
    os.environ.pop("MTTPU_PALLAS_CONV_IMPL", None)


def probe_fwd():
    """Full flagship forward per sample at b2/b4 under each impl."""
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.ops import pallas_conv as pcv
    from multitalent_tpu.ops.packed_unet import make_inference_apply_fn
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_model

    model = _flagship_model()
    patch = (96, 192, 192)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, jnp.zeros((1, *patch, 1)))["params"]
    for impl in ("tap", "im2col", "sum"):
        os.environ["MTTPU_PALLAS_CONV_IMPL"] = impl
        pcv._build.cache_clear()
        apply_fn = make_inference_apply_fn(model)
        for b in (2, 4):
            xin = jnp.asarray(np.random.RandomState(0).randn(b, *patch, 1),
                              jnp.bfloat16)
            f = jax.jit(lambda p, v: apply_fn(p, v))
            try:
                dt = timeit(f, params, xin, n=6, warmup=2)
                print(f"impl={impl:7s} b{b}: {dt*1e3:7.1f} ms = "
                      f"{dt/b*1e3:6.1f} ms/sample", flush=True)
            except Exception as e:
                print(f"impl={impl:7s} b{b}: FAILED {type(e).__name__}",
                      flush=True)
    os.environ.pop("MTTPU_PALLAS_CONV_IMPL", None)


def probe_stages():
    """XLA conv throughput on each interior (unpacked) stage shape, b4."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def conv(xv, wv, strides=(1, 1, 1)):
        pad = tuple(((k - 1) // 2, (k - 1) // 2) for k in wv.shape[:3])
        return lax.conv_general_dilated(
            xv, wv, strides, pad, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    b = 4
    shapes = [  # (label, spatial, cin, cout)
        ("enc2a (strided in)", (24, 48, 48), 120, 120),
        ("enc2b", (24, 48, 48), 120, 120),
        ("enc3", (12, 24, 24), 240, 240),
        ("enc4", (6, 12, 12), 320, 320),
        ("dec1 conv0", (12, 24, 24), 480, 240),
        ("dec2 conv0", (24, 48, 48), 240, 120),
    ]
    rng = np.random.RandomState(0)
    for label, sp, cin, cout in shapes:
        xin = jnp.asarray(rng.randn(b, *sp, cin), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, 3, cin, cout) * 0.02, jnp.bfloat16)

        def chained(xv, wv):
            o = conv(xv, wv)
            for _ in range(3):
                o = conv(o, wv[..., :o.shape[-1], :])
            return o

        f = jax.jit(lambda a, bb: chained(a, bb)) if cin == cout else \
            jax.jit(lambda a, bb: conv(a, bb))
        reps = 4 if cin == cout else 1
        dt = timeit(f, xin, w, n=8) / reps
        flops = 2 * 27 * cin * cout * b * np.prod(sp)
        print(f"{label:18s} {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s",
              flush=True)


def probe_train():
    """Liver dummyLoad train-step breakdown: augment / fwd+bwd / full."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from multitalent_tpu.augment.params import default_3D_augmentation_params
    from multitalent_tpu.augment.pipeline import (ds_scales_from_pools,
                                                  make_augment_fn)
    from multitalent_tpu.models.generic_unet import GenericUNet
    from multitalent_tpu.ops.packed_unet import make_train_forward_fn
    from multitalent_tpu.training.losses import (dc_and_ce_loss,
                                                 deep_supervision_loss,
                                                 ds_loss_weights)
    from multitalent_tpu.training.schedules import make_poly_schedule
    from multitalent_tpu.training.train_state import (TrainState,
                                                      make_sgd_optimizer)

    patch = (128, 128, 128)
    batch = 2
    pools = ((2, 2, 2),) * 5
    model = GenericUNet(input_channels=1, base_num_features=32, num_classes=3,
                        pool_op_kernel_sizes=pools,
                        conv_kernel_sizes=((3, 3, 3),) * 6,
                        deep_supervision=True, dtype=jnp.bfloat16)
    ds_scales = ds_scales_from_pools(pools)
    augment = make_augment_fn(patch, ds_scales,
                              dict(default_3D_augmentation_params), 1)
    weights = [float(w) for w in ds_loss_weights(len(pools), mask_lowest=True)]
    forward = make_train_forward_fn(model)

    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, jnp.zeros((1, *patch, 1)))["params"]
    tx = make_sgd_optimizer(make_poly_schedule(1e-2, 1000, 250))
    state = TrainState.create(model.apply, params, tx)
    host = np.random.RandomState(0)
    data = jnp.asarray(host.randn(batch, 1, *patch), jnp.float32)
    seg = jnp.asarray(host.randint(0, 3, (batch, 1, *patch)), jnp.float32)
    key = jax.random.PRNGKey(1)

    # (a) augmentation alone
    aug = jax.jit(lambda r, d, s: augment(r, d, s))
    dt = timeit(aug, key, data, seg, n=6)
    print(f"augment alone: {dt*1e3:7.1f} ms", flush=True)

    # (b) fwd+bwd+update on pre-augmented tensors
    adata, atargets = jax.jit(augment)(key, data, seg)

    def fwd_step(state, d, targets):
        def compute(p):
            outs = forward(p, d, deterministic=False)
            return deep_supervision_loss(
                outs, targets, partial(dc_and_ce_loss, batch_dice=False),
                weights)
        loss, grads = jax.value_and_grad(compute)(state.params)
        return state.apply_gradients(grads), loss

    fstep = jax.jit(fwd_step)
    dt = timeit(lambda: fstep(state, adata, atargets), n=6)
    print(f"fwd+bwd+update: {dt*1e3:7.1f} ms", flush=True)

    # (c) full step
    def full_step(state, r, d, s):
        dd, tt = augment(r, d, s)
        return fwd_step(state, dd, tt)

    fullstep = jax.jit(full_step)
    dt = timeit(lambda: fullstep(state, key, data, seg), n=6)
    print(f"full step: {dt*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    from multitalent_tpu.configuration import enable_compilation_cache
    enable_compilation_cache()
    todo = sys.argv[1:] or ["impls"]
    for name in todo:
        print(f"=== {name} ===", flush=True)
        globals()[f"probe_{name}"]()
