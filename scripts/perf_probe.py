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
    """Conv kernel impl A/B — delegated to scripts/conv_impl_arms.py, where
    the measured-loser arms (sum/im2col/wino/tap3) now live; the production
    kernel (ops/pallas_conv.py) keeps only the winning 'tap' schedule."""
    import conv_impl_arms
    conv_impl_arms.main()
    return


def _probe_impls_legacy():
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

    for impl in ("tap",):
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
    for impl in ("tap",):
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


def probe_bgemm():
    """Batched small-M GEMM rate (the Winograd transform-domain shape):
    einsum [g, m, k] x [g, k, n] with g=64 transform points."""
    import jax
    import jax.numpy as jnp
    host = np.random.RandomState(0)
    g, k = 64, 128
    reps = 40  # chained inside one jit: sub-ms kernels are otherwise
    #            dispatch-bound behind the relay (~2 ms/dispatch)
    for m, n in ((128, 128), (256, 128), (512, 128), (1024, 128), (256, 120)):
        a = jnp.asarray(host.randn(g, m, k), jnp.bfloat16)
        b = jnp.asarray(host.randn(g, k, n) * 0.05, jnp.bfloat16)

        def chained(x, y):
            for _ in range(reps):
                out = jnp.einsum("gmk,gkn->gmn", x, y,
                                 preferred_element_type=jnp.float32)
                if n < k:
                    out = jnp.concatenate([out, out[..., :k - n]], -1)
                x = out.astype(x.dtype)
            return x

        f = jax.jit(chained)
        dt = timeit(f, a, b, n=4) / reps
        flops = 2 * g * m * k * n
        print(f"bgemm g{g} m{m} k{k} n{n}: {dt*1e6:8.1f} us "
              f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)


def probe_gather():
    """Gather microbenchmarks: scalar gathers (map_coordinates-style) vs row
    gathers (vmapped dynamic_slice, contiguous lanes) — decides the warp
    kernel strategy."""
    import jax
    import jax.numpy as jnp
    host = np.random.RandomState(0)
    zyx = (132, 132, 132)
    n = int(np.prod(zyx))
    vol = jnp.asarray(host.randn(*zyx), jnp.float32)
    flat = vol.ravel()
    idx = jnp.asarray(host.randint(0, n, n), jnp.int32)

    f1 = jax.jit(lambda v, i: jnp.take(v, i))
    dt = timeit(f1, flat, idx, n=4)
    print(f"scalar take {n} idx: {dt*1e3:8.2f} ms "
          f"({n/dt/1e6:7.1f} M elem/s)", flush=True)

    # full trilinear warp cost at this size, one channel (for scale reference)
    from multitalent_tpu.augment.spatial import (_centered_grid, _warp_volume,
                                                 rotation_matrix_3d)
    grid = _centered_grid(zyx)
    r = rotation_matrix_3d(0.3, 0.2, 0.1)
    coords = r @ grid + jnp.asarray([(s - 1) / 2.0 for s in zyx],
                                    jnp.float32)[:, None]
    f2 = jax.jit(lambda v: _warp_volume(v, coords, 1, 0.0))
    dt = timeit(f2, vol, n=4)
    print(f"map_coordinates warp {zyx}: {dt*1e3:8.2f} ms", flush=True)

    # row gather: [R, 128] rows via vmapped dynamic_slice and via take(axis=0)
    rows = jnp.asarray(host.randn(n // 128, 128), jnp.float32)
    ridx = jnp.asarray(host.randint(0, n // 128, n // 128), jnp.int32)
    f3 = jax.jit(lambda v, i: jax.vmap(
        lambda k: jax.lax.dynamic_slice(v, (k, 0), (1, 128)))(i))
    dt = timeit(f3, rows, ridx, n=4)
    print(f"row dyn-slice {n//128} x 128: {dt*1e3:8.2f} ms "
          f"({n*4/dt/1e9:6.1f} GB/s)", flush=True)
    f4 = jax.jit(lambda v, i: jnp.take(v, i, axis=0))
    dt = timeit(f4, rows, ridx, n=4)
    print(f"row take     {n//128} x 128: {dt*1e3:8.2f} ms "
          f"({n*4/dt/1e9:6.1f} GB/s)", flush=True)

    # shear-style: per-(z,y) row shift via take_along_axis on the lane axis
    k = jnp.asarray(host.randint(0, 132, (132, 132)), jnp.int32)
    xi = (jnp.arange(132)[None, None, :] + k[:, :, None]) % 132
    f5 = jax.jit(lambda v, i: jnp.take_along_axis(v, i, axis=2))
    dt = timeit(f5, vol, xi, n=4)
    print(f"lane take_along_axis {zyx}: {dt*1e3:8.2f} ms", flush=True)


def probe_fwd2():
    """Full flagship forward per sample, current default routing, b2/b4."""
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.ops.packed_unet import make_inference_apply_fn
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_model

    model = _flagship_model()
    patch = (96, 192, 192)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, jnp.zeros((1, *patch, 1)))["params"]
    apply_fn = make_inference_apply_fn(model)
    for b in (2, 4):
        xin = jnp.asarray(np.random.RandomState(0).randn(b, *patch, 1),
                          jnp.bfloat16)
        f = jax.jit(lambda p, v: apply_fn(p, v))
        dt = timeit(f, params, xin, n=6, warmup=2)
        print(f"fwd b{b}: {dt*1e3:7.1f} ms = {dt/b*1e3:6.1f} ms/sample",
              flush=True)


def probe_interior():
    """Pallas tap kernel vs XLA on the interior (C>=120) stage shapes, b4.

    Only square-ish channel counts that fit VMEM; cout != cin exercised on the
    decoder stages."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from multitalent_tpu.ops import pallas_conv as pcv

    def xla_conv(xv, wv):
        return lax.conv_general_dilated(
            xv, wv, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    b = 4
    shapes = [
        ("enc2 (24,48,48)x120", (24, 48, 48), 120, 120),
        ("enc3 (12,24,24)x240", (12, 24, 24), 240, 240),
        ("dec2 (24,48,48) 240->120", (24, 48, 48), 240, 120),
        ("dec1 (12,24,24) 480->240", (12, 24, 24), 480, 240),
    ]
    rng = np.random.RandomState(0)
    for label, sp, cin, cout in shapes:
        xin = jnp.asarray(rng.randn(b, *sp, cin), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, 3, cin, cout) * 0.02, jnp.bfloat16)
        flops = 2 * 27 * cin * cout * b * int(np.prod(sp))

        def chain4(f):
            def run(xv, wv):
                o = f(xv, wv)
                for _ in range(3):
                    o = f(o, wv) if cin == cout else o + 0 * o
                return o
            return run

        reps = 4 if cin == cout else 1
        for name, fn in (("xla", xla_conv), ("pallas", pcv.pallas_conv3d_same)):
            try:
                g = jax.jit(chain4(fn)) if reps == 4 else jax.jit(fn)
                dt = timeit(g, xin, w, n=8) / reps
                print(f"{label:28s} {name:6s} {dt*1e3:7.2f} ms "
                      f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)
            except Exception as e:
                print(f"{label:28s} {name:6s} FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


def probe_augment():
    """Per-transform cost of the on-device augmentation at Liver dummyLoad
    shape (b2, 128^3, 1 modality)."""
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.augment import intensity as I
    from multitalent_tpu.augment import spatial as S
    from multitalent_tpu.augment.params import default_3D_augmentation_params
    from multitalent_tpu.augment.pipeline import ds_scales_from_pools

    p = dict(default_3D_augmentation_params)
    patch = (128, 128, 128)
    b = 2
    host = np.random.RandomState(0)
    data = jnp.asarray(host.randn(b, *patch, 1), jnp.float32)
    seg = jnp.asarray(host.randint(0, 3, (b, *patch)), jnp.float32)
    key = jax.random.PRNGKey(1)
    ds_scales = [tuple(s) for s in ds_scales_from_pools(((2, 2, 2),) * 5)]

    cases = [
        ("spatial_warp", jax.jit(lambda k, d, s: S.spatial_augment(
            k, d, s, patch, scale_range=tuple(p["scale_range"]),
            rot_x=tuple(p["rotation_x"]), rot_y=tuple(p["rotation_y"]),
            rot_z=tuple(p["rotation_z"]), p_rot=0.2, p_scale=0.2))),
        ("spatial_rot_forced", jax.jit(lambda k, d, s: S.spatial_augment(
            k, d, s, patch, scale_range=tuple(p["scale_range"]),
            rot_x=tuple(p["rotation_x"]), rot_y=tuple(p["rotation_y"]),
            rot_z=tuple(p["rotation_z"]), p_rot=1.0, p_scale=0.2))),
        ("gauss_noise", jax.jit(lambda k, d, s: I.gaussian_noise(k, d))),
        ("gauss_blur", jax.jit(lambda k, d, s: I.gaussian_blur(k, d))),
        ("brightness", jax.jit(
            lambda k, d, s: I.brightness_multiplicative(k, d))),
        ("contrast", jax.jit(lambda k, d, s: I.contrast_augmentation(k, d))),
        ("lowres_sim", jax.jit(
            lambda k, d, s: I.simulate_low_resolution(k, d))),
        ("gamma_x2", jax.jit(lambda k, d, s: I.gamma_augmentation(
            jax.random.fold_in(k, 1),
            I.gamma_augmentation(k, d, invert=True)))),
        ("mirror", jax.jit(lambda k, d, s: S.mirror_augment(k, d, s))),
        ("ds_downsample", jax.jit(
            lambda k, d, s: S.downsample_seg_for_ds(s, ds_scales))),
    ]
    for name, fn in cases:
        try:
            dt = timeit(fn, key, data, seg, n=6)
            print(f"{name:14s} {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:14s} FAILED {type(e).__name__}: {str(e)[:100]}",
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

    # (a) augmentation alone — average over distinct keys (the per-sample
    # rotation branch makes cost draw-dependent)
    aug = jax.jit(lambda r, i, d, s: augment(jax.random.fold_in(r, i), d, s))
    for _ in range(2):
        sync(aug(key, np.int32(0), data, seg))
    t0 = time.time()
    n = 20
    for i in range(n):
        out = aug(key, np.int32(i), data, seg)
    sync(out)
    dt = (time.time() - t0) / n
    print(f"augment alone (avg over {n} keys): {dt*1e3:7.1f} ms", flush=True)

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

    # (c) full step, averaged over distinct keys
    def full_step(state, r, i, d, s):
        dd, tt = augment(jax.random.fold_in(r, i), d, s)
        return fwd_step(state, dd, tt)

    fullstep = jax.jit(full_step)
    for _ in range(2):
        sync(fullstep(state, key, np.int32(0), data, seg))
    t0 = time.time()
    n = 20
    for i in range(n):
        out = fullstep(state, key, np.int32(i), data, seg)
    sync(out)
    dt = (time.time() - t0) / n
    print(f"full step (avg over {n} keys): {dt*1e3:7.1f} ms", flush=True)




def probe_engine():
    """Engine-overhead decomposition at the bench volume: device_put of the
    volume, devloop with a near-zero apply_fn (engine-only), finalize+RLE."""
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.ops.sliding_window import (SlidingWindowPredictor,
                                                    fetch_packed_rle,
                                                    unpack_class_bits)
    patch = (96, 192, 192)
    vshape = (256, 320, 320)
    vol = np.random.RandomState(0).randn(1, *vshape).astype(np.float32)

    # 1) volume put (the padded (256,320,320,1) fp32 = 125 MB)
    pv = np.moveaxis(vol, 0, -1)
    for rep in range(2):
        t0 = time.time()
        d = jax.device_put(pv)
        sync(d)
        print(f"device_put fp32 volume: {time.time()-t0:6.2f} s", flush=True)
    t0 = time.time()
    d16 = jax.device_put(pv.astype(np.float16))
    sync(d16)
    print(f"device_put fp16 volume: {time.time()-t0:6.2f} s", flush=True)

    # 2) engine-only: trivial apply (one multiply, broadcast to 47 channels)
    dummy_w = jnp.ones((1, 47), jnp.bfloat16)

    def tiny_apply(params, batch):
        return (batch.astype(jnp.bfloat16) * params).astype(jnp.float32) \
            if False else jnp.broadcast_to(
                batch.astype(jnp.bfloat16), batch.shape[:-1] + (47,)
            ).astype(jnp.float32) * 0.1

    pred = SlidingWindowPredictor(tiny_apply, patch, in_channels=1,
                                  num_classes=47, nonlin="sigmoid",
                                  step_size=0.5, do_mirroring=True,
                                  mirror_axes=(0, 1, 2), use_gaussian=True,
                                  tta_chunk=2)
    for rep in range(3):
        t0 = time.time()
        packed_dev, slicer = pred.predict_to_device(dummy_w, vol,
                                                    pack_threshold=0.5)
        jax.block_until_ready(packed_dev)
        # sync via 1-elem fetch
        np.asarray(packed_dev.ravel()[:1])
        t1 = time.time()
        print(f"engine-only volume (compute+finalize): {t1-t0:6.2f} s",
              flush=True)
    t0 = time.time()
    pk = fetch_packed_rle(packed_dev)
    t1 = time.time()
    unpack_class_bits(pk[tuple(slicer) + (slice(None),)], 47)
    print(f"rle fetch: {t1-t0:6.2f} s  unpack: {time.time()-t1:6.2f} s",
          flush=True)




def probe_put():
    """Does H2D device_put overlap with running compute on the relay?"""
    import jax
    import jax.numpy as jnp
    host = np.random.RandomState(0)
    vol = host.randn(256, 320, 320, 1).astype(np.float32)
    vol16 = vol.astype(np.float16)
    volb = vol.astype(jnp.bfloat16)

    # a ~7s compute: chained matmuls
    a = jnp.asarray(host.randn(4096, 4096), jnp.bfloat16)

    @jax.jit
    def burn(a):
        for _ in range(600):
            a = jnp.tanh(a @ a) * 0.5
        return a
    sync(burn(a))
    t0 = time.time(); r = burn(a); sync(r)
    t_burn = time.time() - t0
    print(f"burn alone: {t_burn:6.2f} s", flush=True)

    for label, v in (("fp32", vol), ("fp16", vol16), ("bf16", volb)):
        t0 = time.time(); d = jax.device_put(v); sync(d)
        print(f"put {label} alone: {time.time()-t0:6.2f} s", flush=True)
        del d
    # overlapped: dispatch burn first, then put while it runs
    t0 = time.time()
    r = burn(a)
    d = jax.device_put(vol)
    sync(r); sync(d)
    print(f"burn + fp32 put overlapped: {time.time()-t0:6.2f} s "
          f"(sum would be {t_burn + 7:.0f}ish)", flush=True)
    # put dispatched first, then burn
    t0 = time.time()
    d = jax.device_put(vol)
    r = burn(a)
    sync(r); sync(d)
    print(f"fp32 put then burn: {time.time()-t0:6.2f} s", flush=True)


def probe_profile():
    """xprof trace of the current default packed forward (packed_output path,
    b2 flagship): per-op-category device-time buckets."""
    import glob
    import shutil
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.ops.packed_unet import (make_inference_apply_fn,
                                                 make_packed_inference_apply_fn)
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_model

    model = _flagship_model()
    patch = (96, 192, 192)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, *patch, 1)))["params"]
    pfn, pfac = make_packed_inference_apply_fn(model, patch)
    fn = jax.jit(pfn if pfn is not None else make_inference_apply_fn(model))
    x = jnp.asarray(np.random.RandomState(0).randn(2, *patch, 1), jnp.float16)
    for _ in range(2):
        sync(fn(params, x))
    tdir = "/tmp/xprof_fwd"
    shutil.rmtree(tdir, ignore_errors=True)
    jax.profiler.start_trace(tdir)
    for _ in range(4):
        out = fn(params, x)
    sync(out)
    jax.profiler.stop_trace()
    paths = glob.glob(tdir + "/**/*.xplane.pb", recursive=True)
    print("trace files:", paths, flush=True)
    for p in paths:
        summarize_xplane(p, iters=4)


def probe_volume():
    """Steady-state sliding-window s/volume (bench._measure, pipelined puts +
    RLE fetch) — the quick hardware A/B for engine changes."""
    import jax
    sys.path.insert(0, "/root/repo")
    import bench as benchmod
    res = benchmod._measure(jax.devices()[0], True)
    print({k: res[k] for k in ("volumes_per_min", "per_repeat_s", "best_s")},
          flush=True)


def probe_trainprofile():
    """xprof trace of the dummyLoad train step (bench._measure_train protocol:
    Liver 3d_fullres 128^3 bs2): per-op device-time buckets of fwd+bwd+update."""
    import glob
    import shutil
    import jax
    import jax.numpy as jnp
    from functools import partial
    from multitalent_tpu.models.generic_unet import GenericUNet
    from multitalent_tpu.ops.packed_unet import make_train_forward_fn
    from multitalent_tpu.training.losses import (dc_and_ce_loss,
                                                 deep_supervision_loss,
                                                 ds_loss_weights)
    from multitalent_tpu.training.schedules import make_poly_schedule
    from multitalent_tpu.training.train_state import (TrainState,
                                                      make_sgd_optimizer)

    patch = (128, 128, 128)
    pools = ((2, 2, 2),) * 5
    model = GenericUNet(input_channels=1, base_num_features=32, num_classes=3,
                        pool_op_kernel_sizes=pools,
                        conv_kernel_sizes=((3, 3, 3),) * 6,
                        deep_supervision=True, dtype=jnp.bfloat16)
    weights = [float(w) for w in ds_loss_weights(len(pools), mask_lowest=True)]
    forward = make_train_forward_fn(model)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, *patch, 1)))["params"]
    tx = make_sgd_optimizer(make_poly_schedule(1e-2, 1000, 250))
    state = TrainState.create(model.apply, params, tx)

    def train_core(state, data, targets):
        def compute(p):
            outputs = forward(p, data, deterministic=False)
            return deep_supervision_loss(
                outputs, targets, partial(dc_and_ce_loss, batch_dice=False),
                weights)
        loss, grads = jax.value_and_grad(compute)(state.params)
        return state.apply_gradients(grads), loss

    step = jax.jit(train_core, donate_argnums=(0,))
    host = np.random.RandomState(0)
    data = jnp.asarray(host.randn(2, *patch, 1), jnp.float32)
    targets = [jnp.asarray(
        host.randint(0, 3, (2, 1) + tuple(int(p) // 2 ** d for p in patch)),
        jnp.float32) for d in range(len(weights))]
    # match the bench's target layout
    from multitalent_tpu.augment.pipeline import ds_scales_from_pools
    del targets
    import bench as benchmod
    sys.path.insert(0, "/root/repo")
    from multitalent_tpu.augment.params import default_3D_augmentation_params
    from multitalent_tpu.augment.pipeline import make_augment_fn
    ds_scales = ds_scales_from_pools(pools)
    augment = make_augment_fn(patch, ds_scales,
                              dict(default_3D_augmentation_params), 1)
    dat = jnp.asarray(host.randn(2, 1, *patch), jnp.float32)
    seg = jnp.asarray(host.randint(0, 3, (2, 1, *patch)), jnp.float32)
    data_a, targets_a = jax.jit(augment)(jax.random.PRNGKey(1), dat, seg)
    for _ in range(2):
        state, loss = step(state, data_a, targets_a)
    sync(loss)
    tdir = "/tmp/xprof_train"
    shutil.rmtree(tdir, ignore_errors=True)
    jax.profiler.start_trace(tdir)
    for _ in range(4):
        state, loss = step(state, data_a, targets_a)
    sync(loss)
    jax.profiler.stop_trace()
    for p in glob.glob(tdir + "/**/*.xplane.pb", recursive=True):
        summarize_xplane(p, iters=4)


def probe_ab():
    """Interleaved A/B/C of engine schedules (controls for relay drift):
    A = plain packed, B = fused chain + kernel stats, C = fused + XLA stats.
    Round-robin single volumes, 3 rounds."""
    import jax
    from multitalent_tpu.ops.packed_unet import (make_inference_apply_fn,
                                                 make_packed_inference_apply_fn)
    from multitalent_tpu.ops.sliding_window import SlidingWindowPredictor
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_model
    import bench as benchmod
    import jax.numpy as jnp

    model = _flagship_model()
    patch = (96, 192, 192)
    volume_shape = (256, 320, 320)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, *patch, 1)))["params"]
    vol = benchmod._phantom_volume(volume_shape)
    variants = [("plain", {"MTTPU_FUSED_NORM": "0"}),
                ("fused-kstats", {"MTTPU_FUSED_NORM": "1",
                                  "MTTPU_FUSED_STATS": "kernel"}),
                ("fused-xstats", {"MTTPU_FUSED_NORM": "1",
                                  "MTTPU_FUSED_STATS": "xla"})]
    preds = {}
    for name, env in variants:
        os.environ.update(env)
        apply_fn = make_inference_apply_fn(model)
        pfn, pfac = make_packed_inference_apply_fn(model, patch)
        preds[name] = SlidingWindowPredictor(
            apply_fn, patch, in_channels=1, num_classes=47, nonlin="sigmoid",
            step_size=0.5, do_mirroring=True, mirror_axes=(0, 1, 2),
            use_gaussian=True, device=jax.devices()[0],
            packed_apply=(pfn, pfac) if pfn is not None else None)
        t0 = time.time()
        out, _ = preds[name].predict_to_device(params, vol, pack_threshold=0.5)
        jax.block_until_ready(out)
        print(f"warmup {name}: {time.time()-t0:.1f} s", flush=True)
    times = {name: [] for name, _ in variants}
    for r in range(3):
        for name, _ in variants:
            pred = preds[name]
            put = pred.begin_put(vol)
            t0 = time.time()
            out, _ = pred.predict_to_device(params, preput=put,
                                            pack_threshold=0.5)
            jax.block_until_ready(out)
            times[name].append(time.time() - t0)
            print(f"round {r} {name}: {times[name][-1]:.2f} s", flush=True)
    for name, ts in times.items():
        print(f"{name}: best {min(ts):.2f} median {sorted(ts)[len(ts)//2]:.2f}",
              flush=True)


def probe_swprofile():
    """xprof trace of ONE full sliding-window volume via the devloop program
    (the bench-critical path): true per-op device-time buckets including the
    flip/accumulate machinery around the forward."""
    import glob
    import shutil
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.ops.packed_unet import (make_inference_apply_fn,
                                                 make_packed_inference_apply_fn)
    from multitalent_tpu.ops.sliding_window import SlidingWindowPredictor
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_model
    import bench as benchmod

    model = _flagship_model()
    patch = (96, 192, 192)
    volume_shape = (256, 320, 320)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, *patch, 1)))["params"]
    apply_fn = make_inference_apply_fn(model)
    pfn, pfac = make_packed_inference_apply_fn(model, patch)
    predictor = SlidingWindowPredictor(
        apply_fn, patch, in_channels=1, num_classes=47, nonlin="sigmoid",
        step_size=0.5, do_mirroring=True, mirror_axes=(0, 1, 2),
        use_gaussian=True, device=jax.devices()[0],
        packed_apply=(pfn, pfac) if pfn is not None else None)
    vol = benchmod._phantom_volume(volume_shape)
    t0 = time.time()
    packed_dev, _ = predictor.predict_to_device(params, vol,
                                                pack_threshold=0.5)
    jax.block_until_ready(packed_dev)
    print(f"warmup volume: {time.time()-t0:.1f} s", flush=True)
    tdir = "/tmp/xprof_sw"
    shutil.rmtree(tdir, ignore_errors=True)
    jax.profiler.start_trace(tdir)
    t0 = time.time()
    packed_dev, _ = predictor.predict_to_device(params, vol,
                                                pack_threshold=0.5)
    jax.block_until_ready(packed_dev)
    wall = time.time() - t0
    jax.profiler.stop_trace()
    print(f"traced volume: {wall:.1f} s", flush=True)
    for p in glob.glob(tdir + "/**/*.xplane.pb", recursive=True):
        summarize_xplane(p, iters=1)


def summarize_xplane(path, iters=1, top=28):
    """Per-line busy-time union + per-base-name buckets of the sync XLA Ops
    line (async lines overlap compute; reported separately)."""
    import collections
    import re as _re
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            iv = sorted((ev.offset_ps, ev.offset_ps + ev.duration_ps)
                        for ev in line.events)
            if not iv:
                continue
            busy, (cs, ce) = 0, iv[0]
            for s, e in iv[1:]:
                if s > ce:
                    busy += ce - cs
                    cs, ce = s, e
                else:
                    ce = max(ce, e)
            busy += ce - cs
            print(f"{plane.name} line {line.name!r}: {len(line.events)} events,"
                  f" busy {busy/1e12/iters*1e3:.2f} ms/iter", flush=True)
            if line.name != "XLA Ops":
                continue
            tot = collections.Counter()
            cnt = collections.Counter()
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                base = _re.sub(r"[.\\d]+$", "",
                               md.display_name or md.name)
                tot[base] += ev.duration_ps
                cnt[base] += 1
            T = sum(tot.values())
            for k, v in tot.most_common(top):
                print(f"  {v/1e12/iters*1e3:9.3f} ms {100*v/T:5.1f}% "
                      f"x{cnt[k]:5d}  {k}", flush=True)





def probe_swfusions():
    """Instance-level decomposition of the sliding-window volume's 'other
    fusions' bucket: top fusion INSTANCES by device time (no .NNN stripping)
    plus the optimized-HLO definition head of each, so the bucket's contents
    get names (round-5 ask: the 4.44 s 'other fusions' bucket was never
    itemized)."""
    import collections
    import glob
    import re as _re
    import shutil
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.ops.packed_unet import (make_inference_apply_fn,
                                                 make_packed_inference_apply_fn)
    from multitalent_tpu.ops.sliding_window import SlidingWindowPredictor
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_model
    import bench as benchmod

    model = _flagship_model()
    patch = (96, 192, 192)
    volume_shape = (256, 320, 320)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, *patch, 1)))["params"]
    apply_fn = make_inference_apply_fn(model)
    pfn, pfac = make_packed_inference_apply_fn(model, patch)
    predictor = SlidingWindowPredictor(
        apply_fn, patch, in_channels=1, num_classes=47, nonlin="sigmoid",
        step_size=0.5, do_mirroring=True, mirror_axes=(0, 1, 2),
        use_gaussian=True, device=jax.devices()[0],
        packed_apply=(pfn, pfac) if pfn is not None else None)
    vol = benchmod._phantom_volume(volume_shape)
    hlo_path = "/tmp/sw_loop.hlo"
    os.environ["MTTPU_SW_DUMP_HLO"] = hlo_path
    t0 = time.time()
    packed_dev, _ = predictor.predict_to_device(params, vol,
                                                pack_threshold=0.5)
    jax.block_until_ready(packed_dev)
    os.environ.pop("MTTPU_SW_DUMP_HLO", None)
    print(f"warmup volume: {time.time()-t0:.1f} s", flush=True)
    tdir = "/tmp/xprof_swf"
    shutil.rmtree(tdir, ignore_errors=True)
    jax.profiler.start_trace(tdir)
    t0 = time.time()
    packed_dev, _ = predictor.predict_to_device(params, vol,
                                                pack_threshold=0.5)
    jax.block_until_ready(packed_dev)
    wall = time.time() - t0
    jax.profiler.stop_trace()
    print(f"traced volume: {wall:.1f} s", flush=True)

    # HLO fusion definitions by name
    hlo_defs = {}
    try:
        cur = None
        for ln in open(hlo_path):
            m = _re.match(r"\s*%?(fused_computation[^ ]*|\S+fusion\S*)\s", ln)
            if " = " in ln and "fusion(" in ln:
                nm = ln.split(" = ")[0].strip().lstrip("%")
                hlo_defs[nm] = ln.strip()[:220]
    except OSError:
        pass

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    for p in glob.glob(tdir + "/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                tot = collections.Counter()
                cnt = collections.Counter()
                for ev in line.events:
                    md = ev_meta[ev.metadata_id]
                    name = md.display_name or md.name
                    tot[name] += ev.duration_ps
                    cnt[name] += 1
                fus = {k: v for k, v in tot.items()
                       if k.startswith(("fusion", "loop_", "input_",
                                        "output_", "wide."))}
                T = sum(tot.values())
                F = sum(fus.values())
                print(f"== {plane.name}: total {T/1e12:.2f} s, "
                      f"named-fusion {F/1e12:.2f} s ==", flush=True)
                for k, v in sorted(fus.items(), key=lambda kv: -kv[1])[:25]:
                    d = hlo_defs.get(k, "")
                    print(f"  {v/1e12*1e3:9.1f} ms x{cnt[k]:5d}  {k}"
                          f"\n      {d[:200]}", flush=True)



if __name__ == "__main__":
    from multitalent_tpu.configuration import enable_compilation_cache
    enable_compilation_cache()
    todo = sys.argv[1:] or ["impls"]
    for name in todo:
        print(f"=== {name} ===", flush=True)
        globals()[f"probe_{name}"]()
