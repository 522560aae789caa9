"""Headline benchmark: MultiTalent sliding-window inference volumes/min per chip.

Measures the full reference inference path (predict_MultiTalent semantics:
96x192x192 patch, 0.5 step, gaussian importance weighting, 8-way mirror TTA,
sigmoid over 47 region channels) on one chip over a representative abdominal-CT
volume, via the tiled scan engine in multitalent_tpu/ops/sliding_window.py.

Baseline derivation (vs_baseline): the reference publishes A100-40GB-PCIe *training*
epoch times (documentation/expected_epoch_times.md:74 — Task003_Liver 3d_fullres,
41.49 s for 250 iterations at batch 2, patch 128^3, AMP). From that we derive the
A100's achieved conv throughput on this workload family and convert it to
sliding-window volumes/min for the MultiTalent configuration:

  flops_train_epoch = 500 patches x (fwd + bwd) FLOPs of the Liver UNet
                      (bwd ~ 2x fwd)
  a100_flops_per_s  = flops_train_epoch / 41.49 s
  baseline_vol/min  = a100_flops_per_s * 60 / flops_per_multitalent_volume

This favors the A100 (assumes inference runs at full training-measured
throughput with zero host/tiling overhead).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np


def unet_forward_flops(patch_size, base_features, num_pool, num_classes,
                       in_channels=1, conv_per_stage=2, max_features=320,
                       pool_kernels=None) -> float:
    """Analytic forward-pass FLOPs (2*MACs) of GenericUNet: encoder + bottleneck +
    decoder (transpconv + convs) + full-res seg head. DS heads at lower
    resolutions are negligible and inference uses only the full-res head."""
    if pool_kernels is None:
        pool_kernels = [[2, 2, 2]] * num_pool
    feats = [min(base_features * 2 ** d, max_features) for d in range(num_pool + 1)]
    k = 27  # 3x3x3
    total = 0.0
    shape = np.array(patch_size, float)
    # encoder stages 0..num_pool-1 (stage d>0 starts with a strided conv)
    cin = in_channels
    for d in range(num_pool):
        if d > 0:
            shape = shape / np.array(pool_kernels[d - 1], float)
        vox = float(np.prod(shape))
        total += 2 * vox * k * cin * feats[d]
        for _ in range(conv_per_stage - 1):
            total += 2 * vox * k * feats[d] * feats[d]
        cin = feats[d]
    # bottleneck
    shape_b = shape / np.array(pool_kernels[num_pool - 1], float)
    vox = float(np.prod(shape_b))
    total += 2 * vox * k * cin * feats[num_pool]
    for _ in range(conv_per_stage - 1):
        total += 2 * vox * k * feats[num_pool] * feats[num_pool]
    # decoder
    cur = feats[num_pool]
    shape = shape_b
    for u in range(num_pool):
        f_skip = feats[num_pool - 1 - u]
        stride = np.array(pool_kernels[num_pool - 1 - u], float)
        shape = shape * stride
        vox = float(np.prod(shape))
        total += 2 * vox * float(np.prod(stride)) * cur * f_skip / float(np.prod(stride))
        total += 2 * vox * k * (2 * f_skip) * f_skip
        for _ in range(conv_per_stage - 2):
            total += 2 * vox * k * f_skip * f_skip
        cur = f_skip
    # full-res seg head (1x1x1)
    total += 2 * float(np.prod(patch_size)) * cur * num_classes
    return total


def multitalent_volume_flops(volume_shape, patch=(96, 192, 192), step_size=0.5,
                             tta=8) -> tuple[float, int]:
    """Total forward FLOPs for one sliding-window volume (all tiles x TTA)."""
    from multitalent_tpu.ops.sliding_window import compute_steps_for_sliding_window
    padded = [max(s, p) for s, p in zip(volume_shape, patch)]
    steps = compute_steps_for_sliding_window(patch, padded, step_size)
    n_tiles = int(np.prod([len(s) for s in steps]))
    per_tile = unet_forward_flops(
        patch, base_features=30, num_pool=5, num_classes=47,
        pool_kernels=[[2, 2, 2]] * 4 + [[1, 2, 2]])
    return per_tile * n_tiles * tta, n_tiles


def a100_baseline_volumes_per_min(volume_shape) -> float:
    liver_fwd = unet_forward_flops((128, 128, 128), base_features=32, num_pool=5,
                                   num_classes=3)
    # 250 iters x batch 2, fwd+bwd ~ 3x fwd, 41.49 s (expected_epoch_times.md:74)
    a100_flops_per_s = 500 * 3 * liver_fwd / 41.49
    vol_flops, _ = multitalent_volume_flops(volume_shape)
    return a100_flops_per_s * 60.0 / vol_flops


def _phantom_volume(shape) -> np.ndarray:
    """Structured synthetic CT (1, Z, Y, X): a body cylinder with a few
    ellipsoidal 'organs' of distinct intensity plus mild noise. White noise
    would make every thresholded region mask spatially incoherent, which
    defeats the RLE-compressed device->host fetch that real (anatomically
    coherent) predictions hit — the bench must exercise the production path,
    not an adversarial one."""
    rs = np.random.RandomState(0)
    z, y, x = shape
    zz = np.linspace(-1, 1, z, dtype=np.float32)[:, None, None]
    yy = np.linspace(-1, 1, y, dtype=np.float32)[None, :, None]
    xx = np.linspace(-1, 1, x, dtype=np.float32)[None, None, :]
    vol = np.full(shape, -1.0, np.float32)
    body = (yy ** 2 + xx ** 2) < 0.81  # (1, y, x), broadcasts over z
    vol[np.broadcast_to(body, shape)] = 0.0
    organs = [(rs.uniform(-0.5, 0.5, 3), rs.uniform(0.1, 0.35, 3),
               rs.uniform(0.3, 1.5)) for _ in range(6)]
    scratch = np.empty((y, x), np.float32)
    for iz in range(z):  # slab-wise: avoids multi-GB (z,y,x) temporaries
        vz = vol[iz]
        for c, r, val in organs:
            d = np.square((zz[iz, 0, 0] - c[0]) / r[0])
            scratch[:] = d
            scratch += np.square((yy[0] - c[1]) / r[1])
            scratch += np.square((xx[0] - c[2]) / r[2])
            vz[(scratch < 1.0) & body[0] & (vz >= 0.0)] = val
        vz += rs.randn(y, x).astype(np.float32) * 0.05
    return vol[None]


def pick_device():
    """Default accelerator if it answers a tiny jitted op within a timeout, else
    the host CPU (tunnelled TPU backends can be reachable but hung)."""
    from concurrent.futures import ThreadPoolExecutor
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    if dev.platform != "tpu":
        return dev, False

    def probe():
        x = jax.device_put(jnp.zeros((8, 128)), dev)
        return float(jax.jit(lambda v: (v + 1).sum())(x))

    with ThreadPoolExecutor(1) as ex:
        fut = ex.submit(probe)
        try:
            # generous: the remote-compile relay has been observed to take >2
            # minutes for even a trivial program when its cache is cold/busy
            fut.result(timeout=600)
            return dev, True
        except Exception:
            print("# accelerator probe failed; falling back to CPU",
                  flush=True)
            return jax.devices("cpu")[0], False


def _force_plain_convs_off_tpu(on_tpu: bool) -> None:
    """The packed/Pallas conv paths gate on the DEFAULT backend platform; when
    the default backend is a (possibly dead) tunnelled TPU but this process
    measures on the host CPU, they would trace Pallas kernels that cannot
    lower on CPU. Kill-switch them for CPU measurements."""
    import os
    if not on_tpu:
        os.environ["MTTPU_PALLAS_CONV"] = "0"
        os.environ["MTTPU_PACKED_CONV"] = "0"
        os.environ["MTTPU_PACKED_TRAIN"] = "0"


def _calibrate_head_bias(model, params, apply_fn, patch, device,
                         vol: np.ndarray):
    """Make the random-init net's thresholded masks production-like.

    Random head weights put every class's logit distribution straddling the
    0.5 threshold (measured: median 54% foreground per class, 74M RLE runs
    on the alt volume) — an adversarial mask-transport case no trained model
    produces: real MultiTalent outputs are compact organ masks, ~0-3%
    foreground per class (47 organs in one CT). The seg head is bias-free
    (reference parity), so the shift rides a rank-1 head-kernel update along
    the mean-feature direction: per class k, logits drop by their tile-level
    99% quantile, leaving ~1% foreground of coherent blobs where the
    phantom's organ structure pushes logits over threshold. Pure weight edit — every
    conv/norm in the measured path is unchanged, so compute cost is
    identical; only the transported artifact becomes representative."""
    import jax
    import jax.numpy as jnp
    head = f"seg{model.num_pool - 1}"
    w = np.asarray(params[head]["kernel"], np.float32)  # (1,1,1,F,K)
    feat = w.shape[3]
    # CENTER tile: corner tiles sit mostly outside the phantom's body
    # cylinder, and stats taken there over-shift (round-5: a corner-tile
    # -3sigma calibration left every flagship mask empty)
    starts = [max(0, (s - p) // 2) for s, p in zip(vol.shape[1:], patch)]
    tile = vol[:, starts[0]:starts[0] + patch[0],
               starts[1]:starts[1] + patch[1],
               starts[2]:starts[2] + patch[2]]
    tile_dev = jax.device_put(
        np.moveaxis(tile, 0, -1)[None].astype(np.float32), device)

    logits = np.asarray(jax.jit(apply_fn)(params, tile_dev), np.float32)
    lf = logits.reshape(-1, logits.shape[-1])

    # probe the pre-head features: identity head on the first F channels
    probe = dict(params)
    wid = np.zeros_like(w)
    wid[0, 0, 0, :, :feat] = np.eye(feat, dtype=np.float32)[:, :w.shape[4]]
    probe[head] = {"kernel": jnp.asarray(wid)}
    f = np.asarray(jax.jit(apply_fn)(probe, tile_dev),
                   np.float32).reshape(-1, w.shape[4])[:, :feat]
    m = f.mean(0)
    u = m / max(float(m @ m), 1e-6)  # u @ f ~= 1 per voxel

    # exact per-class quantile target: 1% foreground per class at the
    # calibration tile — the organ-like regime (47 compact masks per CT).
    # (-3 sigma left every flagship mask empty, which under-exercises the
    # transport instead of over-exercising it; sigma-based shifts are at
    # the mercy of the logit distribution's tails)
    alpha = -np.quantile(lf, 0.99, axis=0)
    w2 = w.copy()
    w2[0, 0, 0] += u[:, None] * alpha[None, :]
    out = dict(params)
    out[head] = {"kernel": jnp.asarray(w2, np.asarray(
        params[head]["kernel"]).dtype)}
    return out


def _measure(device, on_tpu: bool, volume_shape=None,
             n_repeats=None) -> dict:
    import jax
    import jax.numpy as jnp
    _force_plain_convs_off_tpu(on_tpu)
    from multitalent_tpu.ops.sliding_window import SlidingWindowPredictor
    from __graft_entry__ import _flagship_model
    # representative abdominal CT at MultiTalent target spacing (1.5, 1, 1)
    if volume_shape is None:
        volume_shape = (256, 320, 320) if on_tpu else (48, 96, 96)

    if on_tpu:
        model = _flagship_model()
        patch = (96, 192, 192)
    else:
        # CPU fallback: same topology at half scale so the benchmark still runs
        import jax.numpy as _jnp
        from multitalent_tpu.models.generic_unet import GenericUNet
        from __graft_entry__ import FLAGSHIP_KERNELS, FLAGSHIP_POOLS
        model = GenericUNet(input_channels=1, base_num_features=30,
                            num_classes=47,
                            pool_op_kernel_sizes=FLAGSHIP_POOLS,
                            conv_kernel_sizes=FLAGSHIP_KERNELS,
                            deep_supervision=False, dtype=_jnp.bfloat16)
        patch = (48, 96, 96)
    example = jax.device_put(jnp.zeros((1, *patch, 1)), device)
    params = jax.jit(model.init)(jax.device_put(jax.random.PRNGKey(0), device),
                                 example)["params"]

    from multitalent_tpu.ops.packed_unet import (make_inference_apply_fn,
                                                 make_packed_inference_apply_fn)
    apply_fn = make_inference_apply_fn(model)
    pfn, pfac = make_packed_inference_apply_fn(model, patch)

    predictor = SlidingWindowPredictor(
        apply_fn, patch, in_channels=1, num_classes=47, nonlin="sigmoid",
        step_size=0.5, do_mirroring=True, mirror_axes=(0, 1, 2),
        use_gaussian=True, device=device,
        packed_apply=(pfn, pfac) if pfn is not None else None)

    vol = _phantom_volume(volume_shape)
    params = _calibrate_head_bias(model, params, apply_fn, patch, device, vol)

    # warmup: compile + one full pass (incl. host fetch). The measured artifact
    # is predict_MultiTalent's: 47 thresholded binary region masks
    # (predict_MultiTalent.py:252-263 exports each region channel via
    # region_class_order=((1,),), i.e. prob > 0.5) — thresholding runs on
    # device and the masks cross the device->host link bit-packed (the
    # tunnelled link moves ~8 MB/s, so fetching fp16 probabilities would
    # measure the tunnel, not the machine).
    from multitalent_tpu.ops.sliding_window import unpack_class_bits
    out = predictor.predict_regions_packed(params, vol)
    assert out.shape == (47, *volume_shape)

    # pipelined throughput, as predict_cases runs in production: volume i's
    # RLE encodes are enqueued while the device is idle, THEN volume i+1's
    # compute is dispatched, and volume i's device->host transfer + host
    # unpack overlap that compute (the device stream is in-order, so encodes
    # dispatched after the next volume would queue behind it). The headline is
    # the MEDIAN repeat (steady-state behavior); per_repeat_s and best_s are
    # reported alongside because the tunnelled relay's latency fluctuates
    # with its compile-queue state. Transport is class-major bit-plane RLE
    # (finalize_bits; MTTPU_SW_BITS=0 falls back to the uint32 word path).
    from multitalent_tpu.ops.sliding_window import (bits_fetch_begin,
                                                    bits_fetch_finish)
    import os as _os
    use_bits = _os.environ.get("MTTPU_SW_BITS", "1") != "0"
    from multitalent_tpu.ops.sliding_window import (rle_fetch_begin,
                                                    rle_fetch_finish)
    # Repeat protocol (round-4 hardening): the tunnelled relay's bandwidth
    # fluctuates 4-45 MB/s between repeats, and round 3's median-of-5 let a
    # single 101.65 s relay stall halve the reported headline. Now: one
    # UNTIMED warm-up repeat, then n>=9 timed repeats; the headline is the
    # MEDIAN, with the 20%-trimmed mean, best, and spread reported alongside
    # (matching the reference's own repeat discipline,
    # expected_epoch_times.md:40-62).
    if n_repeats is None:
        n_repeats = 9 if on_tpu else 1
    pending = None
    per_repeat = []
    # volume i+1's host->device put is issued right after dispatching volume
    # i's compute: the ~125 MB transfer then streams over the relay while the
    # device is busy instead of serializing in front of the next dispatch
    # (predict_cases pipelines identically)
    from concurrent.futures import ThreadPoolExecutor as _TPE
    put_pool = _TPE(1)
    next_put = put_pool.submit(predictor.begin_put, vol)

    def fetch_begin(dev_result):
        return (bits_fetch_begin(dev_result) if use_bits
                else rle_fetch_begin(dev_result))

    def fetch_finish(token, slicer):
        if use_bits:
            return bits_fetch_finish(token)[(slice(None),) + tuple(slicer)]
        pk = rle_fetch_finish(token)[tuple(slicer) + (slice(None),)]
        return unpack_class_bits(pk, 47)

    for rep in range(n_repeats + 1):
        t0 = time.time()
        token = fetch_begin(pending[0]) if pending is not None else None
        prev_slicer = pending[1] if pending is not None else None
        # drop the previous device result BEFORE dispatching the next volume:
        # the encode outputs in `token` are all the fetch needs, and the
        # class-major uint8 masks are 1.2 GB at the bench volume — holding
        # them across the next volume's accumulators OOMs the 16 GB chip
        pending = None
        packed_dev, slicer = predictor.predict_to_device(
            params, preput=next_put.result(), pack_threshold=0.5,
            pack_bits=use_bits)
        # the ~0.3-0.5 s of host copies in begin_put (fp16 cast + transfer
        # staging of the 128 MB volume) run on a worker thread, overlapping
        # this volume's compute instead of sitting in the serialized window
        next_put = put_pool.submit(predictor.begin_put, vol)
        if token is not None:
            fetch_finish(token, prev_slicer)
        pending = (packed_dev, slicer)
        jax.block_until_ready(packed_dev)
        if rep > 0:  # repeat 0 is the untimed warm-up
            per_repeat.append(time.time() - t0)
    fetch_finish(fetch_begin(pending[0]), pending[1])
    elapsed = float(np.median(per_repeat))

    # Steady-state chip figure (what scripts/sw_arms.py measures): the volume
    # already device-resident, compute + one on-device sync only — no RLE
    # fetch, no host->device put in the timed window. headline - steady_state
    # is the pipelined host/relay overhead per volume.
    steady = []
    if on_tpu:
        token = predictor.begin_put(vol)
        out = None
        for _ in range(3):
            del out  # free the previous result before the next dispatch
            t0 = time.time()
            out, _ = predictor.predict_to_device(params, preput=token,
                                                 pack_threshold=0.5,
                                                 pack_bits=use_bits)
            jax.block_until_ready(out)
            np.asarray(out[0, 0, 0, 0])  # real sync (see round-4 notes)
            steady.append(time.time() - t0)

    srt = sorted(per_repeat)
    trim = max(1, len(srt) // 5)
    trimmed = srt[trim:-trim] if len(srt) > 2 * trim else srt
    return {"volumes_per_min": 60.0 / elapsed, "volume_shape": volume_shape,
            "patch": patch, "on_tpu": on_tpu, "per_repeat_s": per_repeat,
            "best_s": min(per_repeat),
            "trimmed_mean_s": float(np.mean(trimmed)),
            "spread": round(max(per_repeat) / min(per_repeat), 3),
            "steady_state_s": (round(min(steady), 2) if steady else None)}


TRAIN_CONFIGS = {
    # name: (patch, pools, base, classes, a100_s_per_epoch, note[, convs,
    #        in_channels])
    # A100-40GB-PCIe rows from the reference's own benchmark table
    # (documentation/expected_epoch_times.md:68-81, pytorch 1.11 + cuDNN 8.3).
    "liver": ((128, 128, 128), ((2, 2, 2),) * 5, 32, 3, 41.49,
              "Task003_Liver 3d_fullres dummyLoad (128^3, bs2)"),
    # Task002_Heart 3d_fullres: patch 80x192x160, bs 2; z pools 4 of 5 (z
    # extent 80 -> 5). A100 row: 46.52 (the 'dummy' row — random tensors, the
    # protocol measured here).
    "heart": ((80, 192, 160),
              ((2, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 2, 2)), 32, 2,
              46.52, "Task002_Heart 3d_fullres dummyLoad (80x192x160, bs2)"),
    # Task005_Prostate 3d_fullres: patch 20x320x256, bs 2, 2 modalities
    # (T2/ADC), anisotropic topology (two leading 1x3x3 stages; geometry
    # reproduced by our own ExperimentPlanner3Dv21 from the MSD Prostate
    # fingerprint). A100 'dummy' row: 41.78 (expected_epoch_times.md:80 —
    # the dummy row matches this protocol; the non-dummy row is 42.95).
    "prostate": ((20, 320, 256),
                 ((1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2), (1, 2, 2),
                  (1, 2, 2)), 32, 3, 41.78,
                 "Task005_Prostate 3d_fullres dummyLoad (20x320x256, bs2, "
                 "2ch)",
                 ((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3),
                  (3, 3, 3), (3, 3, 3)), 2),
}


def _measure_train(device, on_tpu: bool, config: str = "liver") -> dict:
    """Training throughput, dummyLoad protocol (reference
    nnUNetTrainerV2_dummyLoad.py:26-84 / expected_epoch_times.md:68-81): the
    named task configuration fed random tensors, timing the full production
    train step (on-device augmentation + fwd + bwd + SGD update; the
    reference's number excludes its CPU-process augmentation, ours is part of
    the step). s/epoch = 250 x mean iteration time."""
    import jax
    import jax.numpy as jnp
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

    _force_plain_convs_off_tpu(on_tpu)
    cfg = TRAIN_CONFIGS[config]
    cfg_patch, pools, base, n_classes, a100, note = cfg[:6]
    convs = cfg[6] if len(cfg) > 6 else ((3, 3, 3),) * (len(pools) + 1)
    in_ch = cfg[7] if len(cfg) > 7 else 1
    patch = cfg_patch if on_tpu else (32, 32, 32)
    if not on_tpu:
        pools = ((2, 2, 2),) * 5
        convs = ((3, 3, 3),) * 6
    batch = 2
    model = GenericUNet(input_channels=in_ch, base_num_features=base,
                        num_classes=n_classes,
                        pool_op_kernel_sizes=pools,
                        conv_kernel_sizes=convs,
                        deep_supervision=True, dtype=jnp.bfloat16)
    ds_scales = ds_scales_from_pools(pools)
    augment = make_augment_fn(patch, ds_scales,
                              dict(default_3D_augmentation_params), in_ch)
    weights = [float(w) for w in ds_loss_weights(len(pools), mask_lowest=True)]
    forward = make_train_forward_fn(model)

    rng = jax.device_put(jax.random.PRNGKey(0), device)
    example = jax.device_put(jnp.zeros((1, *patch, 1)), device)
    params = jax.jit(model.init)(rng, example)["params"]
    tx = make_sgd_optimizer(make_poly_schedule(1e-2, 1000, 250))
    state = jax.device_put(TrainState.create(model.apply, params, tx), device)

    from functools import partial

    def train_core(state, data, targets):
        def compute(params):
            outputs = forward(params, data, deterministic=False)
            return deep_supervision_loss(
                outputs, targets, partial(dc_and_ce_loss, batch_dice=False),
                weights)

        loss, grads = jax.value_and_grad(compute)(state.params)
        return state.apply_gradients(grads), loss

    def train_step(state, rng, i, data_bc, seg_b1):
        data, targets = augment(jax.random.fold_in(rng, i), data_bc, seg_b1)
        return train_core(state, data, targets)

    step = jax.jit(train_step, donate_argnums=(0,))
    step_noda = jax.jit(train_core, donate_argnums=(0,))
    host = np.random.RandomState(0)
    data = jax.device_put(
        host.randn(batch, in_ch, *patch).astype(np.float32), device)
    seg = jax.device_put(
        host.randint(0, n_classes, (batch, 1, *patch)).astype(np.float32),
        device)
    key = jax.device_put(jax.random.PRNGKey(1), device)

    # warmup: compile + 2 steps.  Sync via host fetch: on the axon relay
    # block_until_ready returns immediately and would time dispatch only.
    # The key advances every iteration (as in real training): augmentation
    # branches per sample on the draw (rotation -> gather warp), so a fixed
    # key would time one arbitrary branch combination instead of the average.
    for i in range(2):
        state, loss = step(state, key, np.int32(i), data, seg)
    float(loss)
    n_iters = 20 if on_tpu else 3
    t0 = time.time()
    for i in range(n_iters):
        state, loss = step(state, key, np.int32(100 + i), data, seg)
    float(loss)
    per_iter = (time.time() - t0) / n_iters
    s_per_epoch = per_iter * 250

    # strict dummyLoad protocol (the reference's own benchmark semantics:
    # nnUNetTrainerV2_dummyLoad feeds random tensors STRAIGHT to the GPU — its
    # 12-32 augmentation worker processes are outside the timed path). Fixed
    # pre-augmented tensors, fwd + bwd + update only. This is the
    # apples-to-apples number against the 41.49 s A100 row; the DA-inclusive
    # figure above is our production step (augmentation is on-device here).
    aug_once = jax.jit(augment)
    data_a, targets_a = aug_once(key, data, seg)
    data_a = jax.block_until_ready(data_a)
    for i in range(2):
        state, loss = step_noda(state, data_a, targets_a)
    float(loss)
    t0 = time.time()
    for i in range(n_iters):
        state, loss = step_noda(state, data_a, targets_a)
    float(loss)
    per_iter_noda = (time.time() - t0) / n_iters
    s_per_epoch_noda = per_iter_noda * 250

    return {"s_per_epoch": round(s_per_epoch_noda, 2),
            "ms_per_iter": round(per_iter_noda * 1e3, 1),
            "s_per_epoch_incl_da": round(s_per_epoch, 2),
            "ms_per_iter_incl_da": round(per_iter * 1e3, 1),
            "protocol": note + "; headline excludes DA like the reference "
                        "protocol, _incl_da adds the on-device augmentation",
            "a100_s_per_epoch": a100,
            "vs_a100_train": round(a100 / s_per_epoch_noda, 3) if on_tpu
            else None}


def _baseline_volumes_per_min(volume_shape, patch) -> float:
    """A100-derived baseline scaled to the volume/patch actually used (keeps
    the ratio meaningful on the CPU fallback path and for alt shapes)."""
    from multitalent_tpu.ops.sliding_window import compute_steps_for_sliding_window
    padded = [max(s, p) for s, p in zip(volume_shape, patch)]
    steps = compute_steps_for_sliding_window(patch, padded, 0.5)
    n_tiles = int(np.prod([len(s) for s in steps]))
    per_tile = unet_forward_flops(patch, base_features=30, num_pool=5,
                                  num_classes=47,
                                  pool_kernels=[[2, 2, 2]] * 4 + [[1, 2, 2]])
    vol_flops = per_tile * n_tiles * 8
    liver_fwd = unet_forward_flops((128, 128, 128), base_features=32, num_pool=5,
                                   num_classes=3)
    a100_flops_per_s = 500 * 3 * liver_fwd / 41.49
    return a100_flops_per_s * 60.0 / vol_flops


def _strip_accel_site(pythonpath: str) -> str:
    """Drop accelerator-plugin site dirs from a PYTHONPATH string.

    The relay plugin's sitecustomize registers its PJRT client at interpreter
    startup and a wedged relay blocks that registration even under
    JAX_PLATFORMS=cpu — a CPU-fallback re-exec must not load it."""
    import os
    return os.pathsep.join(p for p in pythonpath.split(os.pathsep)
                           if p and "axon" not in p)


def report(res: dict) -> None:
    volumes_per_min = res["volumes_per_min"]
    volume_shape, patch, on_tpu = res["volume_shape"], res["patch"], res["on_tpu"]
    baseline = _baseline_volumes_per_min(volume_shape, patch)
    out = {
        "metric": "multitalent_sliding_window_volumes_per_min",
        "value": round(volumes_per_min, 3),
        "unit": f"volumes/min (vol {volume_shape}, patch {patch}, 8x TTA, "
                f"{'tpu' if on_tpu else 'cpu-fallback'}, median of "
                f"{len(res.get('per_repeat_s', []))} repeats after 1 warm-up)",
        "vs_baseline": round(volumes_per_min / baseline, 3),
        "per_repeat_s": [round(t, 2) for t in res.get("per_repeat_s", [])],
        "trimmed_mean_s": (round(res["trimmed_mean_s"], 2)
                           if res.get("trimmed_mean_s") else None),
        "best_s": round(res["best_s"], 2) if res.get("best_s") else None,
        "spread": res.get("spread"),
        "steady_state_s": res.get("steady_state_s"),
        "train": res.get("train"),
        "train_heart": res.get("train_heart"),
        "train_prostate": res.get("train_prostate"),
    }
    alt = res.get("alt")
    if alt:
        out["inference_alt"] = {
            "volume_shape": alt["volume_shape"],
            "volumes_per_min": round(alt["volumes_per_min"], 3),
            "vs_baseline": round(
                alt["volumes_per_min"]
                / _baseline_volumes_per_min(alt["volume_shape"], patch), 3),
            "per_repeat_s": [round(t, 2) for t in alt["per_repeat_s"]],
            "trimmed_mean_s": (round(alt["trimmed_mean_s"], 2)
                               if alt.get("trimmed_mean_s") else None),
            "best_s": round(alt["best_s"], 2) if alt.get("best_s") else None,
            "steady_state_s": alt.get("steady_state_s"),
        }
    print(json.dumps(out), flush=True)


def main() -> None:
    import os
    import sys
    from concurrent.futures import ThreadPoolExecutor

    import jax

    def _rerun_on_cpu():
        os.environ["JAX_PLATFORMS"] = "cpu"
        # A deeply wedged relay can hang the *interpreter startup* of the
        # re-exec'd process: the accelerator plugin's sitecustomize registers
        # the PJRT client before user code runs, and that registration blocks
        # even under JAX_PLATFORMS=cpu (observed round 5). The CPU fallback
        # does not need the plugin — strip its site dir from PYTHONPATH.
        os.environ["PYTHONPATH"] = _strip_accel_site(
            os.environ.get("PYTHONPATH", ""))
        os.execv(sys.executable, [sys.executable] + sys.argv)

    # A wedged relay can make jax.devices() HANG (observed round 5: backend
    # init never returned after the tunnel died mid-run), not just raise —
    # probe it under a watchdog so the benchmark always reports something.
    _init_ex = ThreadPoolExecutor(1)  # no shutdown: joining a hung init
    try:                              # thread would block forever
        _init_ex.submit(jax.devices).result(
            timeout=float(os.environ.get("MTTPU_BENCH_INIT_TIMEOUT", 300)))
    except RuntimeError:
        # accelerator backend unreachable (e.g. tunnel down): rerun on CPU
        if os.environ.get("JAX_PLATFORMS") != "cpu":
            _rerun_on_cpu()
        raise
    except TimeoutError:
        print("# accelerator backend init hung; falling back to CPU",
              flush=True)
        if os.environ.get("JAX_PLATFORMS") != "cpu":
            # the hung init thread would block interpreter exit; exec
            # replaces the process image outright
            _rerun_on_cpu()
        raise

    from multitalent_tpu.configuration import enable_compilation_cache
    enable_compilation_cache()

    device, on_tpu = pick_device()
    budget_s = float(os.environ.get("MTTPU_BENCH_TIMEOUT", 1500))
    if on_tpu:
        # watchdogged: a remote/tunnelled accelerator can accept the probe but
        # stall on large compiles; fall back to a CPU measurement in that case
        # so the benchmark always reports
        ex = ThreadPoolExecutor(3)
        fut = ex.submit(_measure, device, True)
        try:
            res = fut.result(timeout=budget_s)
        except Exception as e:
            # the round-2 fused kernels (norm-prologue conv, seg-head d2s) are
            # the newest moving parts: retry once with them disabled before
            # giving up on the accelerator entirely
            print(f"# accelerator measurement failed/stalled ({type(e).__name__}); "
                  "retrying with fused kernels disabled", flush=True)
            os.environ["MTTPU_FUSED_NORM"] = "0"
            os.environ["MTTPU_PALLAS_SEGHEAD"] = "0"
            try:
                res = ex.submit(_measure, device, True).result(timeout=budget_s)
            except Exception as e2:
                print(f"# retry failed ({type(e2).__name__}); falling back to "
                      "CPU", flush=True)
                cpu = jax.devices("cpu")[0]
                report(_measure(cpu, False))
                os._exit(0)
        # training throughput (watchdogged + non-fatal: its compile can stall
        # on a busy relay and the inference headline must still report)
        train_budget = float(os.environ.get("MTTPU_BENCH_TRAIN_TIMEOUT", 900))
        tfut = ex.submit(_measure_train, device, True, "liver")
        try:
            res["train"] = tfut.result(timeout=train_budget)
        except Exception as e:
            print(f"# train measurement failed/stalled ({type(e).__name__})",
                  flush=True)
            res["train"] = None
        # second train configuration + second inference volume shape (each
        # watchdogged + non-fatal): guards the headline against one-shape
        # overfitting. Skippable via MTTPU_BENCH_EXTRAS=0 on tight budgets.
        if os.environ.get("MTTPU_BENCH_EXTRAS", "1") != "0":
            extras_budget = float(
                os.environ.get("MTTPU_BENCH_EXTRAS_TIMEOUT", 700))
            try:
                res["train_heart"] = ex.submit(
                    _measure_train, device, True,
                    "heart").result(timeout=extras_budget)
            except Exception as e:
                print(f"# heart train measurement failed/stalled "
                      f"({type(e).__name__})", flush=True)
                res["train_heart"] = None
            try:
                res["alt"] = ex.submit(
                    _measure, device, True, (192, 256, 256),
                    5).result(timeout=extras_budget)
            except Exception as e:
                print(f"# alt-shape inference measurement failed/stalled "
                      f"({type(e).__name__})", flush=True)
                res["alt"] = None
            try:
                res["train_prostate"] = ex.submit(
                    _measure_train, device, True,
                    "prostate").result(timeout=extras_budget)
            except Exception as e:
                print(f"# prostate train measurement failed/stalled "
                      f"({type(e).__name__})", flush=True)
                res["train_prostate"] = None
        report(res)
        os._exit(0)
    res = _measure(device, False)
    res["train"] = _measure_train(device, False)
    report(res)


if __name__ == "__main__":
    main()
