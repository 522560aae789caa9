"""Train-step breakdown on TPU (run solo — contends with nothing).

Usage: python scripts/train_probe.py [parts ...]
Parts: step aug fwd bwd wgrad
  step  - full production train step (bench.py's _measure_train protocol)
  aug   - augmentation alone (same key-advancing protocol)
  fwd   - packed train forward alone
  bwd   - value_and_grad of forward+loss (no augment, no optimizer)
  wgrad - XLA dw contraction rate on the packed stage shape
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


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / n


PATCH = (128, 128, 128)
BATCH = 2
POOLS = ((2, 2, 2),) * 5


def _liver_model():
    import jax.numpy as jnp
    from multitalent_tpu.models.generic_unet import GenericUNet
    return GenericUNet(input_channels=1, base_num_features=32, num_classes=3,
                       pool_op_kernel_sizes=POOLS,
                       conv_kernel_sizes=((3, 3, 3),) * 6,
                       deep_supervision=True, dtype=jnp.bfloat16)


def _data():
    import jax
    host = np.random.RandomState(0)
    data = jax.numpy.asarray(host.randn(BATCH, 1, *PATCH).astype(np.float32))
    seg = jax.numpy.asarray(
        host.randint(0, 3, (BATCH, 1, *PATCH)).astype(np.float32))
    return data, seg


def _augment_fn():
    from multitalent_tpu.augment.params import default_3D_augmentation_params
    from multitalent_tpu.augment.pipeline import (ds_scales_from_pools,
                                                  make_augment_fn)
    ds_scales = ds_scales_from_pools(POOLS)
    return make_augment_fn(PATCH, ds_scales,
                           dict(default_3D_augmentation_params), 1), ds_scales


def probe_aug():
    import jax
    augment, _ = _augment_fn()
    data, seg = _data()
    key = jax.random.PRNGKey(1)

    # key advances per call, as in training (branches differ per draw);
    # report the mean over enough draws to average the branch mix
    f = jax.jit(lambda k, i, d, s: augment(jax.random.fold_in(k, i), d, s))
    for _ in range(2):
        sync(f(key, np.int32(0), data, seg))
    n = 16
    t0 = time.time()
    for i in range(n):
        out = f(key, np.int32(100 + i), data, seg)
    sync(out)
    dt = (time.time() - t0) / n
    print(f"augment (b{BATCH} {PATCH}): {dt*1e3:8.1f} ms/iter", flush=True)


def probe_fwd():
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.ops.packed_unet import make_train_forward_fn
    model = _liver_model()
    forward = make_train_forward_fn(model)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, *PATCH, 1)))["params"]
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(BATCH, *PATCH, 1).astype(np.float32), jnp.bfloat16)
    f = jax.jit(lambda p, v: forward(p, v, deterministic=False))
    dt = timeit(f, params, x, n=8)
    print(f"train fwd (b{BATCH}): {dt*1e3:8.1f} ms", flush=True)


def probe_bwd():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from multitalent_tpu.ops.packed_unet import make_train_forward_fn
    from multitalent_tpu.training.losses import (dc_and_ce_loss,
                                                 deep_supervision_loss,
                                                 ds_loss_weights)
    model = _liver_model()
    forward = make_train_forward_fn(model)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, *PATCH, 1)))["params"]
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(BATCH, *PATCH, 1).astype(np.float32), jnp.bfloat16)
    host = np.random.RandomState(1)
    targets = []
    shape = list(PATCH)
    for lvl in range(len(POOLS)):
        targets.append(jnp.asarray(
            host.randint(0, 3, (BATCH, *shape)).astype(np.float32)))
        shape = [s // 2 for s in shape]
    weights = [float(w) for w in ds_loss_weights(len(POOLS), mask_lowest=True)]

    def compute(params, x, targets):
        outputs = forward(params, x, deterministic=False)
        return deep_supervision_loss(
            outputs, targets, partial(dc_and_ce_loss, batch_dice=False),
            weights)

    f = jax.jit(lambda p, v, t: jax.value_and_grad(compute)(p, v, t))
    dt = timeit(f, params, x, targets, n=8)
    print(f"train fwd+bwd+loss (b{BATCH}): {dt*1e3:8.1f} ms", flush=True)


def probe_wgrad():
    """XLA's dw contraction rate at the packed stage shape vs dx and fwd."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    rng = np.random.RandomState(0)
    n, z, y, x, c = 2, 64, 64, 64, 128
    xin = jnp.asarray(rng.randn(n, z, y, x, c), jnp.bfloat16)
    g = jnp.asarray(rng.randn(n, z, y, x, c), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.05, jnp.bfloat16)
    flops = 2 * 27 * c * c * n * z * y * x

    def conv(xv, wv):
        return lax.conv_general_dilated(
            xv, wv, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def chain(fn, k=4):
        def run(*args):
            outs = [fn(*args)]
            for _ in range(k - 1):
                outs.append(fn(*args))
            return sum(o.sum() for o in outs)
        return run

    f_fwd = jax.jit(chain(lambda a, b: conv(a, b)))
    dt = timeit(f_fwd, xin, w, n=6) / 4
    print(f"wgrad probe fwd  conv: {dt*1e3:7.2f} ms {flops/dt/1e12:6.1f} TFLOP/s",
          flush=True)

    def dwfn(xv, gv):
        _, vjp = jax.vjp(lambda wv: conv(xv, wv), w)
        (dw,) = vjp(gv)
        return dw

    f_dw = jax.jit(chain(dwfn))
    dt = timeit(f_dw, xin, g, n=6) / 4
    print(f"wgrad probe dw  (XLA): {dt*1e3:7.2f} ms {flops/dt/1e12:6.1f} TFLOP/s",
          flush=True)

    def dxfn(gv, wv):
        _, vjp = jax.vjp(lambda xv: conv(xv, wv), xin)
        (dx,) = vjp(gv)
        return dx

    f_dx = jax.jit(chain(dxfn))
    dt = timeit(f_dx, g, w, n=6) / 4
    print(f"wgrad probe dx  (XLA): {dt*1e3:7.2f} ms {flops/dt/1e12:6.1f} TFLOP/s",
          flush=True)


def probe_step():
    import jax
    os.environ.setdefault("MTTPU_BENCH_TIMEOUT", "3600")
    import bench
    dev = jax.devices()[0]
    res = bench._measure_train(dev, dev.platform == "tpu")
    print(res, flush=True)


if __name__ == "__main__":
    from multitalent_tpu.configuration import enable_compilation_cache
    enable_compilation_cache()
    parts = sys.argv[1:] or ["aug", "fwd", "bwd"]
    for p in parts:
        globals()[f"probe_{p}"]()
