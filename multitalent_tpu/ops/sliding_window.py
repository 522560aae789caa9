"""Sliding-window tiled inference engine.

Parity target: the SegmentationNetwork inference engine
(nnunet/network_architecture/neural_network.py:73-591): step-grid computation
(`_compute_steps_for_sliding_window`:261-285), gaussian importance map
(`_get_gaussian`:245-259, sigma = patch/8), per-tile mirror-TTA prediction
accumulated with gaussian weights and divided by the accumulated weight
(`_internal_predict_3D_3Dconv_tiled`:287-428, `_internal_maybe_mirror_and_pred_3D`
:502-591).

TPU-native design:

- the whole padded volume and the fp32 accumulators live in HBM across the whole
  prediction; tiles are `dynamic_slice` views
- ONE jitted step processes one (tile, TTA-chunk): batched flipped forward,
  gaussian-weighted read-modify-write into donated accumulators. The host loops
  over tiles issuing async dispatches — compile cost is that of a single forward
  pass (a scan-over-tiles variant made XLA compile times explode for large
  patches), per-step dispatch overhead is microseconds against ~100ms of compute,
  and arbitrary image sizes share the same compiled program (no recompiles, no
  bucketing)
- mirror TTA flips are applied/undone inside the step as a batch of
  `tta_chunk` combinations (chunking bounds live activation memory: a full 8-way
  (96,192,192,47) fp32 batch plus accumulators overflows a 16G chip)
- per-axis padding to the patch size happens on host once; accumulators divide
  elementwise at the end (gaussian parity with the reference's
  aggregated_results / aggregated_nb_of_predictions)
"""
from __future__ import annotations

import os
from functools import lru_cache, partial
from itertools import combinations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter

from multitalent_tpu import native


def compute_steps_for_sliding_window(patch_size, image_size, step_size: float) -> list[list[int]]:
    """Per-axis start coordinates (neural_network.py:261-285): first step at 0, last
    step flush with the image end, actual spacing <= step_size * patch (evenly
    distributed)."""
    assert all(i >= j for i, j in zip(image_size, patch_size)), \
        "image must be at least as large as the patch"
    assert 0 < step_size <= 1
    target_step_sizes_in_voxels = [i * step_size for i in patch_size]
    num_steps = [int(np.ceil((i - k) / j)) + 1
                 for i, j, k in zip(image_size, target_step_sizes_in_voxels, patch_size)]
    steps = []
    for dim in range(len(patch_size)):
        max_step_value = image_size[dim] - patch_size[dim]
        if num_steps[dim] > 1:
            actual_step_size = max_step_value / (num_steps[dim] - 1)
        else:
            actual_step_size = 1e8  # only one step at 0
        steps.append([int(np.round(actual_step_size * i)) for i in range(num_steps[dim])])
    return steps


def get_gaussian_importance_map(patch_size, sigma_scale: float = 1.0 / 8) -> np.ndarray:
    """Gaussian tile-weighting map, max-normalized, zeros clamped to the smallest
    nonzero value (neural_network.py:245-259)."""
    tmp = np.zeros(patch_size)
    center_coords = [i // 2 for i in patch_size]
    sigmas = [i * sigma_scale for i in patch_size]
    tmp[tuple(center_coords)] = 1
    g = gaussian_filter(tmp, sigmas, 0, mode="constant", cval=0)
    g = g / np.max(g)
    g = g.astype(np.float32)
    g[g == 0] = np.min(g[g != 0])
    return g


def pad_to_patch(volume_zyxc: np.ndarray, patch_size) -> tuple[np.ndarray, list[slice]]:
    """Symmetric zero-pad so every axis >= patch (pad_nd_image semantics as used by
    the tiled path); returns (padded, slicer to undo)."""
    shape = volume_zyxc.shape[:-1]
    new_shape = [max(s, p) for s, p in zip(shape, patch_size)]
    diff = [n - s for n, s in zip(new_shape, shape)]
    lo = [d // 2 for d in diff]
    hi = [d - l for d, l in zip(diff, lo)]
    pad = [(l, h) for l, h in zip(lo, hi)] + [(0, 0)]
    padded = np.pad(volume_zyxc, pad, mode="constant")
    slicer = [slice(l, l + s) for l, s in zip(lo, shape)]
    return padded, slicer


def mirror_combinations(mirror_axes: tuple[int, ...]) -> list[tuple[int, ...]]:
    """All subsets of the mirrorable spatial axes (2^m combos incl. identity)."""
    combos: list[tuple[int, ...]] = []
    for r in range(len(mirror_axes) + 1):
        combos.extend(combinations(mirror_axes, r))
    return combos


@lru_cache(maxsize=32)
def _make_tiled_runner(apply_fn_id, patch_size, in_channels, num_classes,
                       mirror_axes, use_gaussian, nonlin, tta_chunk,
                       exact=False, packed_factors=(1, 1),
                       flip_in_weights=False):
    """Builds + jits the scan-over-tiles program. apply_fn_id carries the callable
    (wrapped for hashability by the caller).

    packed_factors=(fy, fx) != (1, 1): apply_fn returns logits in space-to-
    depth packed layout (B, Z, Y/fy, X/fx, P*K), phase-major, and the whole
    accumulation (gaussian weighting, TTA unflip, accumulators) runs in that
    layout — one depth-to-space per volume at finalize instead of one per
    tile (the d2s of full-res 47-channel logits is the largest layout copy of
    the packed forward, ~14 ms per b2 flagship forward on v5e). Requires the
    padded volume dims and every tile offset to be divisible by the factors
    (checked by the caller)."""
    apply_fn = apply_fn_id.fn
    patch = tuple(int(p) for p in patch_size)
    fy, fx = int(packed_factors[0]), int(packed_factors[1])
    nph = fy * fx
    assert patch[1] % fy == 0 and patch[2] % fx == 0
    combos = mirror_combinations(mirror_axes)
    if use_gaussian:
        g = get_gaussian_importance_map(patch)
        if not exact:
            # tail weights clamped to 1e-4: the raw map's corner values (~1e-11
            # for large patches) underflow the fp16 accumulators; relative to
            # the 1.0 center weight both are zero for blending purposes (the
            # reference's own fp16 all_in_gpu mode simply breaks at such
            # voxels). `exact` mode keeps the raw weights (fp32 accumulators).
            g = np.maximum(g, 1e-4)
    else:
        g = np.ones(patch, np.float32)
    # packed phase-major layout of the gaussian map: (Z, Y/fy, X/fx, P);
    # for (1, 1) this is the plain (Z, Y, X, 1) map
    g = g.reshape(patch[0], patch[1] // fy, fy, patch[2] // fx, fx)
    g_packed = np.ascontiguousarray(
        g.transpose(0, 1, 3, 2, 4).reshape(
            patch[0], patch[1] // fy, patch[2] // fx, nph))
    gauss = jnp.asarray(g_packed)
    gauss_div = jnp.asarray(g_packed / len(combos))
    patch_p = (patch[0], patch[1] // fy, patch[2] // fx)
    acc_dtype = jnp.float32 if exact else jnp.float16
    prob_dtype = jnp.float32 if exact else jnp.bfloat16
    chunk = max(1, min(int(tta_chunk), len(combos)))
    n_chunks = (len(combos) + chunk - 1) // chunk
    # Per-chunk combo tuples; the tail chunk may be short (the batched forward
    # pads it with identity copies whose contributions are simply not summed).
    # Flips are STATIC (compile-time lax.rev, one per combo): with the combos
    # known at trace time XLA fuses the reversal indexing into the adjacent
    # copy/multiply, where a data-dependent jnp.where(bits, flip(x), x) costs
    # a full-tensor materialization of both branches plus a select per axis —
    # measured ~6 ms/sample of select traffic on the (96,96,96,188) bf16
    # probability tensors of the flagship patch (v5e xprof).
    chunk_combos_list = tuple(tuple(combos[i * chunk:(i + 1) * chunk])
                              for i in range(n_chunks))

    def flip_static(x, combo):
        # x (*spatial, C); combo: the subset of spatial axes to flip
        return jnp.flip(x, axis=list(combo)) if combo else x

    def flip_static_packed(x, combo):
        """Unflip in packed space: x (Z, Y/fy, X/fx, P*K). A full-res flip of
        an even-length packed axis (y = fy*b + p -> Y-1-y = fy*(Yb-1-b) +
        (fy-1-p)) is a flip of the block axis plus a reversal of that axis's
        phases."""
        if nph == 1:
            return flip_static(x, combo)
        if not combo:
            return x
        v = x.reshape(x.shape[:3] + (fy, fx, num_classes))
        axes = []
        if 0 in combo:
            axes.append(0)
        if 1 in combo:
            axes.extend((1, 3))
        if 2 in combo:
            axes.extend((2, 4))
        return jnp.flip(v, axis=axes).reshape(x.shape)

    def _apply_nonlin(logits):
        """logits -> probabilities in prob_dtype (packed-aware softmax)."""
        if nonlin == "softmax":
            lf = logits.astype(jnp.float32)
            if nph > 1:  # per-phase class softmax in packed layout
                shp = lf.shape
                probs = jax.nn.softmax(
                    lf.reshape(shp[:-1] + (nph, num_classes)), axis=-1
                ).reshape(shp)
            else:
                probs = jax.nn.softmax(lf, axis=-1)
        elif nonlin == "sigmoid":
            probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        else:
            probs = logits.astype(jnp.float32)
        return probs.astype(prob_dtype)

    def _prepare_flipped(params):
        """Per-combo tap-reversed weight trees, computed ONCE per program
        (outside the tile loop): the flip's optimization_barrier blocks XLA's
        loop-invariant code motion, so flipping inside the loop body
        re-executed the packed-weight scatter builds every iteration —
        ~2.5 s of a 19 s bench volume (xprof round 4, the 150-270 ms
        bf16[3,3,3,2,2,30,2,2,30] kLoop fusions)."""
        prep = getattr(apply_fn, "prepare_flipped", None)
        if prep is None:
            return {combo: params for combo in combos}  # apply flips itself
        return prep(params, combos)

    _has_prepare = getattr(apply_fn, "prepare_flipped", None) is not None

    def _tiles_total_flipw(prepared, tiles):
        """Mirror-TTA sum over all combos for a BATCH of tiles, with the
        flips executed in the weights (packed_unet_forward flip_combo:
        tap-reversed kernels + mirrored strided-conv padding) — no activation
        ever flips and every combo's probabilities land directly in the tile
        frame. Replaces the flip/stack/unflip machinery of _chunk_contrib
        (~1.5 s/volume of lax.rev on the full-res probability tensors plus
        the flipped input stacks, v5e xprof).

        The running TTA sum is held in f16 (f32 in `exact` mode): the 8
        read+write sweeps of the full-res sum are pure HBM traffic, and a sum
        of <=8 probabilities in [0,1] carries ~1e-3 relative f16 noise — the
        same trade the fp16 accumulators (and the reference's all_in_gpu
        mode) already make downstream."""
        sum_dtype = jnp.float32 if exact else jnp.float16
        total = None
        for combo in combos:
            probs = _apply_nonlin(apply_fn(prepared[combo], tiles, combo,
                                           preflipped=_has_prepare))
            u = probs.astype(sum_dtype)
            total = u if total is None else total + u
        return total  # f16: the contrib multiply upconverts in-register

    def _accumulate_tiles_flipw(acc, cnt, prepared, padded_volume, coords,
                                weights, aligned8=False):
        """TB tiles x full TTA with one RMW per tile per accumulator.

        aligned8 (static, set by run() after checking the actual step grid):
        every packed y/x tile offset is a multiple of 8, so offsets pass
        through (v // 8) * 8 — value-identical, but the explicit multiply
        lets XLA's alignment analysis prove sublane alignment. A
        dynamic-update-slice with unprovable offsets takes a slow
        whole-row path (~10 ms vs ~1 ms per accumulator RMW on the
        flagship volume, v5e xprof)."""
        def hint8(v):
            return (v // 8) * 8 if aligned8 else v

        tb = coords.shape[0]
        tiles = jnp.stack([
            jax.lax.dynamic_slice(padded_volume,
                                  (coords[t, 0], hint8(coords[t, 1]),
                                   hint8(coords[t, 2]),
                                   0), (*patch, in_channels))
            for t in range(tb)])
        total = _tiles_total_flipw(prepared, tiles)
        gauss_b = (gauss_div[..., None] if nph > 1 else gauss_div)
        for t in range(tb):
            zp, yp, xp = (coords[t, 0], hint8(coords[t, 1] // fy),
                          hint8(coords[t, 2] // fx))
            ms = (total[t].reshape(patch_p + (nph, num_classes))
                  if nph > 1 else total[t])
            contrib = (ms * (gauss_b * weights[t])).reshape(
                patch_p + (nph * num_classes,))
            cur = jax.lax.dynamic_slice(acc, (zp, yp, xp, 0),
                                        (*patch_p, nph * num_classes))
            acc = jax.lax.dynamic_update_slice(
                acc, (cur.astype(jnp.float32) + contrib).astype(acc.dtype),
                (zp, yp, xp, 0))
            cur_c = jax.lax.dynamic_slice(cnt, (zp, yp, xp, 0),
                                          (*patch_p, nph))
            new_c = cur_c.astype(jnp.float32) + gauss * weights[t]
            cnt = jax.lax.dynamic_update_slice(cnt, new_c.astype(cnt.dtype),
                                               (zp, yp, xp, 0))
        return acc, cnt

    def _chunk_contrib(params, tile, chunk_combos):
        """One TTA chunk of one tile: batched flipped forward -> probabilities
        unflipped back to tile frame and summed over the chunk in fp32. No
        accumulator traffic here. The tail chunk runs at its NATURAL batch
        size: the chunks are unrolled in one program anyway, so the second
        batch shape only costs one extra trace of apply_fn while identity
        padding would run a dead forward whose probabilities are discarded."""
        batch = jnp.stack([flip_static(tile, c) for c in chunk_combos])
        # probabilities held in bf16 (fp32 in `exact` mode): halves the live
        # prob buffers so a larger TTA batch fits; the reference's all_in_gpu
        # mode makes the same precision trade with fp16
        # (neural_network.py:338-364)
        probs = _apply_nonlin(apply_fn(params, batch))
        total = None
        for j, c in enumerate(chunk_combos):
            u = flip_static_packed(probs[j], c).astype(jnp.float32)
            total = u if total is None else total + u
        return total

    def _accumulate_tile(acc, cnt, params, padded_volume, z, y, x, weight):
        """One tile x ALL TTA chunks with a single read-modify-write into each
        accumulator: the 8 flip contributions are summed tile-locally in fp32
        first (also slightly more accurate than chunk-wise fp16 RMWs). The
        per-(tile,chunk) RMW this replaces cost ~39 ms/tile of
        dynamic_update_slice traffic on v5e (xprof, (256,320,320) volume).
        `weight` zeros out padding tiles."""
        tile = jax.lax.dynamic_slice(padded_volume, (z, y, x, 0),
                                     (*patch, in_channels))
        total = _chunk_contrib(params, tile, chunk_combos_list[0])
        for j in range(1, n_chunks):
            total = total + _chunk_contrib(params, tile,
                                           chunk_combos_list[j])

        # accumulators are stored fp16 (the reference's all_in_gpu mode does
        # the same, neural_network.py:338-364); the add itself runs in fp32.
        # The TTA mean's 1/len(combos) is folded into the patch-sized gaussian
        # constant (gauss_div) rather than dividing the full-res total — the
        # standalone divide cost ~0.5 s/volume of extra full-tensor traffic on
        # v5e (xprof divide_convert bucket); acc/cnt stay a consistent ratio
        # because cnt accumulates the undivided gauss.
        zp, yp, xp = z, y // fy, x // fx
        gauss_b = (gauss_div[..., None] if nph > 1 else gauss_div)
        ms = (total.reshape(patch_p + (nph, num_classes))
              if nph > 1 else total)
        contrib = (ms * (gauss_b * weight)).reshape(
            patch_p + (nph * num_classes,))
        cur = jax.lax.dynamic_slice(acc, (zp, yp, xp, 0),
                                    (*patch_p, nph * num_classes))
        acc = jax.lax.dynamic_update_slice(
            acc, (cur.astype(jnp.float32) + contrib).astype(acc.dtype),
            (zp, yp, xp, 0))
        cur_c = jax.lax.dynamic_slice(cnt, (zp, yp, xp, 0), (*patch_p, nph))
        new_c = cur_c.astype(jnp.float32) + gauss * weight
        cnt = jax.lax.dynamic_update_slice(cnt, new_c.astype(cnt.dtype),
                                           (zp, yp, xp, 0))
        return acc, cnt

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(acc, cnt, params, padded_volume, coords, weights):
        """Host-loop step: TILES_PER_STEP tiles x full TTA per dispatch
        (used by the multi-device tile-sharding path, where dispatches must
        interleave across devices, and as the MTTPU_SW_DEVICE_LOOP=0
        fallback). The flip combos are compile-time constants baked
        into the program (device-neutral: the multi-device tile sharding
        runs this same program per device)."""
        if flip_in_weights:
            return _accumulate_tiles_flipw(acc, cnt, _prepare_flipped(params),
                                           padded_volume, coords, weights)
        for t in range(coords.shape[0]):
            acc, cnt = _accumulate_tile(acc, cnt, params, padded_volume,
                                        coords[t, 0], coords[t, 1],
                                        coords[t, 2], weights[t])
        return acc, cnt

    _loop_fns: dict = {}

    def _get_loop_fn(n_padded: int, aligned8: bool = False):
        """Whole-volume single-dispatch program: fori_loop over a padded
        coords buffer, all TTA chunks unrolled inside the body. One dispatch
        covers every tile — on tunnelled TPUs the per-dispatch round-trip
        (~0.1 s) otherwise costs ~9 s per (256,320,320) volume across ~90
        dispatches. Trip count is bucketed (multiples of 8) so a handful of
        compilations serve all volumes of one padded shape. In
        flip_in_weights mode the body batches TILES (the combo loop runs
        per-combo forwards with mirrored weights), tile_batch per step."""
        if (n_padded, aligned8) not in _loop_fns:
            if flip_in_weights:
                # in flipw mode the runner's tta_chunk argument IS the tile
                # batch (combos run sequentially with mirrored weights; the
                # batch dim carries tiles) — sized by the caller's
                # _tile_batch_fitting_memory + OOM backoff
                tb = max(1, int(tta_chunk))

                @partial(jax.jit, donate_argnums=(0, 1))
                def run_loop(acc, cnt, params, padded_volume, coords_pad,
                             weights_pad):
                    groups = coords_pad.reshape(-1, tb, 3)
                    wgroups = weights_pad.reshape(-1, tb)
                    # flip + cast ONCE, before the loop: the barrier inside
                    # the flip is opaque to while-loop invariant code motion
                    prepared = _prepare_flipped(params)

                    def body(i, carry):
                        acc, cnt = carry
                        return _accumulate_tiles_flipw(
                            acc, cnt, prepared, padded_volume, groups[i],
                            wgroups[i], aligned8=aligned8)

                    return jax.lax.fori_loop(0, groups.shape[0], body,
                                             (acc, cnt))
            else:

                @partial(jax.jit, donate_argnums=(0, 1))
                def run_loop(acc, cnt, params, padded_volume, coords_pad,
                             weights_pad):
                    def body(i, carry):
                        acc, cnt = carry
                        z, y, x = (coords_pad[i, 0], coords_pad[i, 1],
                                   coords_pad[i, 2])
                        return _accumulate_tile(acc, cnt, params,
                                                padded_volume, z, y, x,
                                                weights_pad[i])

                    return jax.lax.fori_loop(0, n_padded, body, (acc, cnt))

            _loop_fns[(n_padded, aligned8)] = run_loop
        return _loop_fns[(n_padded, aligned8)]

    def _blend(acc, cnt):
        """acc / cnt in packed space -> full-res (Z, Y, X, K) fp32 probs."""
        a = acc.astype(jnp.float32)
        c = cnt.astype(jnp.float32)
        c = jnp.where(c == 0, 1.0, c)
        if nph > 1:
            a = a.reshape(a.shape[:3] + (nph, num_classes))
            out = (a / c[..., None]).reshape(
                a.shape[:3] + (nph * num_classes,))
            from multitalent_tpu.ops.packed_conv import depth_to_space_yx
            return depth_to_space_yx(out[None], (fy, fx))[0]
        return a / c

    @jax.jit
    def finalize_packed(acc, cnt, threshold):
        """Threshold the blended probabilities on device and pack the class
        bits into uint32 words: the device->host transfer shrinks ~16x vs fp16
        probabilities (the tunnelled-TPU link moves ~8 MB/s, so for 47-region
        MultiTalent inference the fetch — not the compute — dominates
        end-to-end time unless the reduction happens on device)."""
        probs = _blend(acc, cnt)
        bits = (probs > threshold)
        nwords = (num_classes + 31) // 32
        pad = nwords * 32 - num_classes
        if pad:
            bits = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
        bits = bits.reshape(*bits.shape[:-1], nwords, 32)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
        return jnp.sum(bits.astype(jnp.uint32) * weights, axis=-1,
                       dtype=jnp.uint32)

    @jax.jit
    def finalize_bits(acc, cnt, threshold):
        """Threshold the blended probabilities and emit CLASS-MAJOR uint8
        masks (K, Z, Y, X). Feeds the bit-plane RLE fetch (bits_fetch_begin):
        one class's mask is spatially coherent where the 32-class uint32
        words of finalize_packed transition whenever ANY class flips, and
        alternating binary runs need no values on the link — about half the
        bytes per run, and the host-side unpack_class_bits pass folds into
        the run expansion itself.

        Thresholds IN PACKED SPACE as `acc > t * cnt` (equivalent to
        probs > t since cnt > 0): the compare fuses into one elementwise
        pass over the f16 accumulators and only uint8 ever materializes —
        blending to full-res f32 first cost a 4.9 GB intermediate at the
        (256,320,320)x47 bench volume and OOMed the 16 GB chip."""
        a = acc.astype(jnp.float32)
        c = cnt.astype(jnp.float32)
        if nph > 1:
            az, ay, ax = a.shape[:3]
            a = a.reshape(az, ay, ax, nph, num_classes)
            bits = (a > threshold * c[..., None]).astype(jnp.uint8)
            b = bits.reshape(az, ay, ax, fy, fx, num_classes)
            b = jnp.transpose(b, (5, 0, 1, 3, 2, 4))  # (K, Z, Y', fy, X', fx)
            return b.reshape(num_classes, az, ay * fy, ax * fx)
        bits = (a > threshold * c).astype(jnp.uint8)
        return jnp.moveaxis(bits, -1, 0)

    @jax.jit
    def finalize(acc, cnt):
        # guard only voxels never touched by any tile (cannot occur for a valid
        # step grid); tiny gaussian-tail weights must divide exactly (parity with
        # aggregated_results / aggregated_nb_of_predictions, neural_network.py:399).
        # fp16 result: halves the device->host transfer; the reference itself
        # stores exported softmax as fp16 (segmentation_export.py:116)
        out = _blend(acc, cnt)
        return out if exact else out.astype(jnp.float16)

    TILES_PER_STEP = 2

    def _tile_groups(coords_host: np.ndarray):
        """Group tile coords into TILES_PER_STEP batches; the tail group pads
        by repeating the last tile with weight 0."""
        n = coords_host.shape[0]
        groups = []
        for g0 in range(0, n, TILES_PER_STEP):
            cg = coords_host[g0:g0 + TILES_PER_STEP]
            wg = np.ones(TILES_PER_STEP, np.float32)
            if cg.shape[0] < TILES_PER_STEP:
                wg[cg.shape[0]:] = 0.0
                cg = np.concatenate(
                    [cg, np.repeat(cg[-1:], TILES_PER_STEP - cg.shape[0], 0)])
            groups.append((np.ascontiguousarray(cg), wg))
        return groups

    def _acc_shapes(padded_volume):
        vz, vy, vx = padded_volume.shape[:3]
        assert vy % fy == 0 and vx % fx == 0
        sp = (vz, vy // fy, vx // fx)
        return sp + (nph * num_classes,), sp + (nph,)

    def run(params, padded_volume, coords_host: np.ndarray, devices=None,
            pack_threshold=None, pack_bits=False):
        if devices is not None and len(devices) > 1:
            return _run_sharded(params, padded_volume, coords_host, devices,
                                pack_threshold, pack_bits)
        acc_shape, cnt_shape = _acc_shapes(padded_volume)
        acc = jnp.zeros(acc_shape, acc_dtype)
        cnt = jnp.zeros(cnt_shape, acc_dtype)
        if os.environ.get("MTTPU_SW_DEVICE_LOOP", "1") != "0":
            n = coords_host.shape[0]
            # pad the tile list only to a multiple of the tile batch: phantom
            # zero-weight tiles still run the full forward, and for one padded
            # volume shape the tile count is fixed anyway (tile_coords is a
            # function of the padded shape), so wider buckets buy no compile
            # reuse. The previous multiple-of-8 pad cost 4 phantom tiles (33%)
            # on a 12-tile (192,256,256) volume — the whole alt-shape compute
            # gap of round 4 (396 vs 302 ms/tile, scripts/alt_probe.py).
            tbp = max(1, int(tta_chunk)) if flip_in_weights else 1
            n_padded = -(-n // tbp) * tbp
            coords_pad = np.concatenate(
                [coords_host, np.repeat(coords_host[-1:], n_padded - n, 0)])
            weights_pad = np.zeros(n_padded, np.float32)
            weights_pad[:n] = 1.0
            aligned8 = bool(
                flip_in_weights
                and np.all(coords_host[:, 1] // fy % 8 == 0)
                and np.all(coords_host[:, 2] // fx % 8 == 0))
            loop_fn = _get_loop_fn(n_padded, aligned8)
            dump = os.environ.get("MTTPU_SW_DUMP_HLO")
            if dump:
                # dev hook: the axon relay ignores --xla_dump_to, but the
                # compiled executable's optimized HLO is still retrievable
                with open(dump, "w") as f:
                    f.write(loop_fn.lower(
                        acc, cnt, params, padded_volume,
                        np.ascontiguousarray(coords_pad),
                        weights_pad).compile().as_text())
            acc, cnt = loop_fn(
                acc, cnt, params, padded_volume,
                np.ascontiguousarray(coords_pad), weights_pad)
        else:
            for cg, wg in _tile_groups(coords_host):
                acc, cnt = step(acc, cnt, params, padded_volume, cg, wg)
        if pack_threshold is not None:
            if pack_bits:
                return finalize_bits(acc, cnt, np.float32(pack_threshold))
            return finalize_packed(acc, cnt, np.float32(pack_threshold))
        return finalize(acc, cnt)

    def _run_sharded(params, padded_volume, coords_host, devices,
                     pack_threshold=None, pack_bits=False):
        """Multi-chip tile sharding: tile groups round-robin over devices, each
        device keeps its own volume copy + accumulators (every step is
        independent), the partial accumulators sum on device 0 at the end.
        Near-linear scaling — no collectives, no cross-device sync until the
        final reduction."""
        acc_shape, cnt_shape = _acc_shapes(padded_volume)
        vols, params_d, accs, cnts = [], [], [], []
        for dev in devices:
            vols.append(jax.device_put(padded_volume, dev))
            params_d.append(jax.device_put(params, dev))
            accs.append(jax.device_put(jnp.zeros(acc_shape, acc_dtype), dev))
            cnts.append(jax.device_put(
                jnp.zeros(cnt_shape, acc_dtype), dev))
        n_dev = len(devices)
        for i, (cg, wg) in enumerate(_tile_groups(coords_host)):
            d = i % n_dev
            accs[d], cnts[d] = step(accs[d], cnts[d], params_d[d], vols[d],
                                    cg, wg)
        acc = accs[0].astype(jnp.float32)
        cnt = cnts[0].astype(jnp.float32)
        for d in range(1, n_dev):
            acc = acc + jax.device_put(accs[d], devices[0]).astype(jnp.float32)
            cnt = cnt + jax.device_put(cnts[d], devices[0]).astype(jnp.float32)
        if pack_threshold is not None:
            fin = finalize_bits if pack_bits else finalize_packed
            return fin(acc.astype(acc_dtype), cnt.astype(acc_dtype),
                       np.float32(pack_threshold))
        return finalize(acc.astype(acc_dtype), cnt.astype(acc_dtype))

    return run


class _HashableFn:
    """Identity-hashed wrapper so lru_cache can key on the apply callable."""

    def __init__(self, fn):
        self.fn = fn

    def __hash__(self):
        return id(self.fn)

    def __eq__(self, other):
        return isinstance(other, _HashableFn) and other.fn is self.fn


class SlidingWindowPredictor:
    """Reusable tiled predictor for one network configuration.

    `apply_fn(params, batch_bzyxc) -> logits_bzyxc` must return full-resolution
    logits (deep supervision off)."""

    def __init__(self, apply_fn, patch_size, in_channels: int, num_classes: int,
                 nonlin: str = "softmax", step_size: float = 0.5,
                 do_mirroring: bool = True, mirror_axes: tuple[int, ...] = (0, 1, 2),
                 use_gaussian: bool = True, tta_chunk: int = 4, device=None,
                 devices=None, exact: bool | None = None, packed_apply=None):
        self.device = device   # optional jax.Device pin (default: backend default)
        self.devices = devices  # optional device list: tiles shard round-robin
        self.apply_fn = _HashableFn(apply_fn)
        # (apply_fn, (fy, fx)) returning space-to-depth packed logits (from
        # packed_unet.make_packed_inference_apply_fn): accumulation runs in
        # packed space when the volume/tile geometry divides by the factors;
        # falls back to `apply_fn` otherwise. Output-equivalent either way.
        self.packed_apply = None
        if packed_apply is not None and tuple(packed_apply[1]) != (1, 1):
            self.packed_apply = (_HashableFn(packed_apply[0]),
                                 (int(packed_apply[1][0]),
                                  int(packed_apply[1][1])))
        self.patch_size = tuple(int(p) for p in patch_size)
        self.in_channels = in_channels
        self.num_classes = num_classes
        self.nonlin = nonlin
        self.step_size = step_size
        self.mirror_axes = tuple(mirror_axes) if do_mirroring else ()
        self.use_gaussian = use_gaussian
        self.tta_chunk = tta_chunk
        if exact is None:
            exact = os.environ.get("MTTPU_SW_EXACT", "0") == "1"
        # exact: fp32 probabilities + accumulators, unclamped gaussian tail —
        # bit-comparable to the reference's fp32 CPU path (used by the golden
        # parity tests); default is the fp16/bf16 production mode (same trade
        # as the reference's all_in_gpu, neural_network.py:338-364)
        self.exact = bool(exact)

    def _tile_batch_fitting_memory(self, padded_shape) -> int:
        """Largest flipw TILE batch fitting HBM (estimate; runtime OOM
        back-off is the safety net). The flipw working set differs from the
        combo-batch path: per tile one f16 TTA sum + bf16 probs/logits at
        num_classes width plus ~5 live bf16 packed feature maps (~300 B/voxel
        at the flagship's C=120-128 stages); fixed costs are the f16
        accumulators + the f16 volume."""
        import jax
        dev = self.device or jax.devices()[0]
        stats = getattr(dev, "memory_stats", lambda: None)()
        hbm = (stats or {}).get("bytes_limit", 16 * 2 ** 30)
        budget = 0.8 * hbm
        vol_vox = float(np.prod(padded_shape))
        patch_vox = float(np.prod(self.patch_size))
        fixed = vol_vox * (self.num_classes * 2 + 2 + self.in_channels * 2)
        # clamp to a power of two (1/2/4/8): run_loop reshapes the 8-padded
        # coords buffer into (-1, tb, 3), so tb must divide 8
        tb = max(1, min(int(os.environ.get("MTTPU_SW_TILE_BATCH", "4")), 8))
        tb = 1 << (tb.bit_length() - 1)
        while tb > 1:
            # ~700 B/voxel of live activations measured on v5e: tb=4 at the
            # (256,320,320)x47 bench volume RESOURCE_EXHAUSTs a 16 GB chip
            # (the runtime back-off caught it; each failed attempt costs a
            # multi-minute relay recompile, so the model errs conservative)
            work = tb * patch_vox * (self.num_classes * 2 * 3 + 700)
            if fixed + work <= budget:
                break
            tb //= 2
        return tb

    def _chunk_fitting_memory(self, padded_shape) -> int:
        """Largest TTA chunk whose accumulators + working set fit the device HBM
        (estimate; the runtime back-off below remains as the safety net)."""
        import jax
        dev = self.device or jax.devices()[0]
        stats = getattr(dev, "memory_stats", lambda: None)()
        hbm = (stats or {}).get("bytes_limit", 16 * 2 ** 30)
        budget = 0.8 * hbm
        vol_vox = float(np.prod(padded_shape))
        patch_vox = float(np.prod(self.patch_size))
        fixed = vol_vox * (self.num_classes * 2 + 2 + self.in_channels * 4)
        chunk = max(1, min(self.tta_chunk, 8))
        while chunk > 1:
            # per-chunk working set: one fp32 logits buffer, bf16 prob buffers
            # (flip + unflip), and an allowance of ~6 live bf16 feature maps at
            # encoder width (calibrated against observed HBM exhaustion at
            # chunk 4 / (256,320,320) x 47 on a 16G chip)
            work = chunk * patch_vox * (self.num_classes * 4
                                        + self.num_classes * 2 * 2 + 360)
            if fixed + work <= budget:
                break
            chunk //= 2
        return chunk

    def tile_coords(self, image_shape) -> np.ndarray:
        steps = compute_steps_for_sliding_window(self.patch_size, image_shape,
                                                 self.step_size)
        return np.array([(z, y, x) for z in steps[0] for y in steps[1]
                         for x in steps[2]], dtype=np.int32)

    def __call__(self, params, volume_czyx: np.ndarray) -> np.ndarray:
        """volume (C, Z, Y, X) float32 -> class/region probabilities (K, Z, Y, X)."""
        probs_dev, slicer = self.predict_to_device(params, volume_czyx)
        return self.fetch(probs_dev, slicer)

    def fetch(self, probs_dev, slicer) -> np.ndarray:
        """Materialize a predict_to_device result on host as (K, Z, Y, X) fp32."""
        probs = np.asarray(probs_dev).astype(np.float32)[tuple(slicer)
                                                         + (slice(None),)]
        return np.moveaxis(probs, -1, 0)

    def begin_put(self, volume_czyx: np.ndarray):
        """Pad + enqueue the host->device transfer of a volume, returning a
        token for predict_to_device(..., preput=token).

        device_put is asynchronous, so a pipelined caller issues the NEXT
        volume's put right after dispatching the current volume's compute —
        the transfer then streams while the device is busy instead of
        serializing in front of the next dispatch (the tunnelled-TPU link
        moves the ~125 MB padded bench volume in ~6-18 s, a quarter of
        end-to-end volume time when paid serially). In the default
        (non-exact) mode the volume ships as fp16 — half the bytes; the
        network computes in bf16 either way ('exact' keeps fp32 end to end
        for reference parity)."""
        import jax
        vol = np.moveaxis(np.ascontiguousarray(volume_czyx, np.float32), 0, -1)
        padded, slicer = pad_to_patch(vol, self.patch_size)
        if not self.exact:
            padded = padded.astype(np.float16)
        coords = self.tile_coords(padded.shape[:-1])
        vol_dev = jax.device_put(padded, self.device)
        return vol_dev, coords, slicer

    def predict_to_device(self, params, volume_czyx: np.ndarray = None,
                          pack_threshold=None, preput=None,
                          pack_bits=False):
        """Run the tiled prediction, returning (device fp16 probs ZYXK, slicer)
        WITHOUT the device->host transfer — callers can overlap the fetch of one
        volume with the compute of the next (predict_cases does).

        With `pack_threshold` the result is instead a device uint32 array
        (Z, Y, X, ceil(K/32)) of thresholded class bits — use when only the
        binary masks are needed (predict_MultiTalent's per-region exports):
        the host fetch shrinks ~16x, which dominates end-to-end time on
        low-bandwidth device links.

        `preput`: a begin_put token; pass it to overlap the volume's
        host->device transfer with the previous volume's compute."""
        import jax
        if preput is None:
            preput = self.begin_put(volume_czyx)
        vol_dev, coords, slicer = preput
        padded = vol_dev  # shape source only; data stays on device
        apply_id, factors = self.apply_fn, (1, 1)
        flipw = False
        if self.packed_apply is not None:
            pfy, pfx = self.packed_apply[1]
            if (padded.shape[1] % pfy == 0 and padded.shape[2] % pfx == 0
                    and not (coords[:, 1] % pfy).any()
                    and not (coords[:, 2] % pfx).any()):
                apply_id, factors = self.packed_apply
                # mirror TTA in the weights (tap-reversed kernels, mirrored
                # strided padding): no activation flips; the combo loop runs
                # per-combo forwards over a tile batch instead of a combo
                # batch. Default on when the apply fn supports it.
                flipw = (getattr(apply_id.fn, "supports_weight_flip", False)
                         and os.environ.get("MTTPU_SW_FLIPW", "1") != "0")
        if flipw:
            # flipw's batch dim carries TILES, not TTA combos — sized by its
            # own memory model (and persisted separately from tta_chunk)
            chunk = self._tile_batch_fitting_memory(padded.shape[:-1])
            prev = getattr(self, "_flipw_tile_batch", None)
            if prev is not None:
                chunk = min(chunk, prev)
        else:
            chunk = min(self.tta_chunk,
                        self._chunk_fitting_memory(padded.shape[:-1]))
        while True:
            runner = _make_tiled_runner(
                apply_id, self.patch_size, self.in_channels,
                self.num_classes, self.mirror_axes, self.use_gaussian,
                self.nonlin, chunk, self.exact, factors,
                flip_in_weights=flipw)
            try:
                probs = runner(params, vol_dev, coords, devices=self.devices,
                               pack_threshold=pack_threshold,
                               pack_bits=pack_bits)
                # persist: don't re-attempt the OOM size
                if flipw:
                    self._flipw_tile_batch = chunk
                else:
                    self.tta_chunk = chunk
                break
            except Exception as e:
                # HBM exhaustion at large volumes: halve the TTA batch. Only
                # resource exhaustion qualifies — any other error (a genuine
                # bug, a dead backend) must surface immediately, not be
                # retried down to chunk==1.
                if chunk <= 1 or not _is_oom_error(e):
                    raise
                chunk //= 2
                print(f"# sliding window: retrying with tta_chunk={chunk}",
                      flush=True)
        return probs, slicer

    def predict_regions_packed(self, params, volume_czyx: np.ndarray,
                               threshold: float = 0.5) -> np.ndarray:
        """Thresholded class masks (K, Z, Y, X) bool via the bit-packed
        device->host path (threshold applied on device). Default transport is
        class-major bit-plane RLE (about half the bytes per run of the uint32
        word path, and the host unpack folds into the run expansion);
        MTTPU_SW_BITS=0 falls back to the word path."""
        if os.environ.get("MTTPU_SW_BITS", "1") != "0":
            bits_dev, slicer = self.predict_to_device(
                params, volume_czyx, pack_threshold=threshold, pack_bits=True)
            masks = bits_fetch_finish(bits_fetch_begin(bits_dev))
            return masks[(slice(None),) + tuple(slicer)]
        packed_dev, slicer = self.predict_to_device(params, volume_czyx,
                                                    pack_threshold=threshold)
        packed = fetch_packed_rle(packed_dev)[tuple(slicer) + (slice(None),)]
        return unpack_class_bits(packed, self.num_classes)


def _is_oom_error(e: BaseException) -> bool:
    """True for device memory exhaustion (XLA RESOURCE_EXHAUSTED / allocator
    OOM), the only error class the TTA-chunk back-off may retry."""
    msg = str(e)
    if "RESOURCE_EXHAUSTED" in msg or "RESOURCE EXHAUSTED" in msg:
        return True
    low = msg.lower()
    return ("out of memory" in low
            or ("allocation" in low and "failed" in low)
            or ("hbm" in low and "exceed" in low))


_RLE_BUCKETS = tuple(1 << k for k in range(14, 26))


@jax.jit
def _rle_count(flat):
    """Number of runs in a 1-D array (first element always starts a run)."""
    return 1 + jnp.sum(flat[1:] != flat[:-1], dtype=jnp.int32)


@partial(jax.jit, static_argnames=("cap",))
def _rle_encode(flat, cap: int):
    """Run starts (int32, padded with n) and their values, capacity `cap`."""
    n = flat.shape[0]
    bound = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                             flat[1:] != flat[:-1]])
    starts = jnp.nonzero(bound, size=cap, fill_value=n)[0].astype(jnp.int32)
    vals = flat[jnp.minimum(starts, n - 1)]
    return starts, vals


def rle_fetch_begin(packed_dev):
    """Dispatch the device-side RLE encodes for a finalize_packed result and
    return a token for rle_fetch_finish.

    Split from the fetch so a pipelined caller (bench.py, predict_cases) can
    enqueue the encodes while the device is idle — reading the run counts here
    synchronizes on packed_dev — and only then dispatch the NEXT volume's
    compute: the token's device->host transfers and the host-side expansion in
    rle_fetch_finish then overlap that compute instead of queueing behind it."""
    shape = tuple(packed_dev.shape)
    w = shape[-1]
    n = int(np.prod(shape[:-1]))
    planes = []
    for wi in range(w):
        plane = jnp.ravel(packed_dev[..., wi])
        cnt = int(_rle_count(plane))
        bucket = next((b for b in _RLE_BUCKETS if b >= cnt), None)
        if bucket is None or bucket * 8 >= n * 4:
            planes.append((None, plane, None))
            continue
        starts, vals = _rle_encode(plane, bucket)
        planes.append((cnt, starts, vals))
    return shape, n, planes


def rle_fetch_finish(token) -> np.ndarray:
    """Transfer + expand a rle_fetch_begin token into the dense uint32 words."""
    from multitalent_tpu.utils.alloc import fast_empty
    shape, n, planes = token
    w = shape[-1]
    out = fast_empty(shape, np.uint32)
    for wi, (cnt, a, b) in enumerate(planes):
        if cnt is None:
            out[..., wi] = np.asarray(a).reshape(shape[:-1])
            continue
        s = np.asarray(a)[:cnt]
        v = np.asarray(b)[:cnt]
        flat_plane = out.reshape(n, w)[:, wi]
        if not native.rle_expand_u32(s, v, n, flat_plane):
            lengths = np.diff(np.append(s, n))
            flat_plane[:] = np.repeat(v, lengths)
    return out


def fetch_packed_rle(packed_dev) -> np.ndarray:
    """Fetch a finalize_packed result (Z, Y, X, W uint32) via device-side
    run-length encoding of each bit-word plane.

    Thresholded segmentation masks are spatially coherent, so the run list is
    typically 10-100x smaller than the dense words; on low-bandwidth device
    links (the tunnelled TPU moves ~8-13 MB/s device->host) the dense fetch of
    a (256,320,320,2) result costs ~15 s and dominates end-to-end inference.
    Falls back to the dense fetch per plane when the run count approaches the
    dense size (e.g. uncorrelated noise). The run count crossing the link
    first also serves as the completion sync for the device pipeline."""
    return rle_fetch_finish(rle_fetch_begin(packed_dev))


_BITS_BLK = 256  # boundary-bitmap block length (multiple of 32)
# finer-grained caps than the word path's (the per-block payload is 36 B, so
# small mask sets deserve small buckets)
_BITS_BUCKETS = tuple(1 << k for k in range(8, 26))


def _bits_bound_blocks(flat):
    """Per-block boundary mask of a 1-D uint8 array: bound[i] = flat[i] !=
    flat[i-1] (bound[0] = True), reshaped (m, _BITS_BLK). The tail pads with
    the last value (edge mode), which introduces no boundary."""
    n = flat.shape[0]
    blk = _BITS_BLK
    pad = (-n) % blk
    if pad:
        flat = jnp.pad(flat, (0, pad), mode="edge")
    m = flat.shape[0] // blk
    b2 = flat.reshape(m, blk)
    prev = jnp.concatenate([jnp.zeros((1,), flat.dtype), b2[:-1, -1]])
    left = jnp.concatenate([prev[:, None], b2[:, :-1]], axis=1)
    return (b2 != left).at[0, 0].set(True)


@jax.jit
def _rle_count_first(flat):
    """(number of runs, first value, number of boundary blocks), fetched in
    one transfer (this read is also the completion sync for the pipeline)."""
    bound = _bits_bound_blocks(flat)
    return jnp.stack([jnp.sum(bound, dtype=jnp.int32),
                      flat[0].astype(jnp.int32),
                      jnp.sum(jnp.any(bound, axis=1), dtype=jnp.int32)])


@partial(jax.jit, static_argnames=("cap",))
def _bits_compact(flat, cap: int):
    """Compacted boundary bitmap: (block indices int32 [cap], packed boundary
    words uint32 [cap, _BITS_BLK/32]). Stream compaction via jnp.nonzero over
    the full element array is sort-bound on TPU (~5.3 s for a 592M-element
    volume, v5e); nonzero over the per-BLOCK nonempty mask plus a gather of
    the few boundary blocks' bit-packed words runs the same job in ~60 ms.
    Binary runs alternate, so no values cross the link — the host recovers
    start positions from the bitmaps."""
    bound = _bits_bound_blocks(flat)
    m = bound.shape[0]
    w = bound.reshape(m, _BITS_BLK // 32, 32).astype(jnp.uint32)
    weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    words = jnp.sum(w * weights, axis=-1, dtype=jnp.uint32)
    nonempty = jnp.any(bound, axis=1)
    idx = jnp.nonzero(nonempty, size=cap, fill_value=m)[0].astype(jnp.int32)
    payload = jnp.where((idx < m)[:, None], words[jnp.minimum(idx, m - 1)], 0)
    return idx, payload


@jax.jit
def _pack_words_from_bits(bits_kzyx):
    """(K, Z, Y, X) uint8 -> (Z, Y, X, ceil(K/32)) uint32 words (the
    finalize_packed layout), for the dense-word fallback when the bit-plane
    run list approaches dense size."""
    k = bits_kzyx.shape[0]
    nwords = (k + 31) // 32
    b = jnp.moveaxis(bits_kzyx, 0, -1)
    pad = nwords * 32 - k
    if pad:
        b = jnp.pad(b, [(0, 0)] * 3 + [(0, pad)])
    b = b.reshape(*b.shape[:-1], nwords, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(b.astype(jnp.uint32) * weights, axis=-1, dtype=jnp.uint32)


def bits_fetch_begin(bits_dev):
    """Dispatch the bit-plane RLE encode for a finalize_bits result
    ((K, Z, Y, X) uint8) and return a token for bits_fetch_finish.

    Class-major binary runs beat the uint32 word planes of rle_fetch_begin
    two ways: one class's mask is spatially coherent where a 32-class word
    transitions whenever ANY class flips, and alternating binary runs need
    only their start indices on the link (4 B/run vs 8). Reading the run
    count here synchronizes on bits_dev — pipelined callers enqueue this
    while the device is idle, then dispatch the next volume's compute."""
    shape = tuple(bits_dev.shape)
    k = shape[0]
    nvox = int(np.prod(shape[1:]))
    flat = jnp.ravel(bits_dev)
    cf = np.asarray(_rle_count_first(flat))
    cnt, first, nblocks = int(cf[0]), int(cf[1]), int(cf[2])
    bucket = next((b for b in _BITS_BUCKETS if b >= nblocks), None)
    nwords = (k + 31) // 32
    # per boundary block the link carries 4 B index + _BITS_BLK/8 B bitmap;
    # when boundary blocks cover most of the array (incoherent masks) the
    # host-side reconstruction (one memset per run) dominates — the word
    # path's per-plane dense fallback bounds that worst case instead
    m = -(-k * nvox // _BITS_BLK)
    if (bucket is None or nblocks >= m // 2
            or bucket * (4 + _BITS_BLK // 8) >= nvox * nwords * 4):
        return ("words", k, rle_fetch_begin(_pack_words_from_bits(bits_dev)))
    idx, payload = _bits_compact(flat, bucket)
    return ("bits", shape, cnt, first, idx, payload)


def bits_fetch_finish(token) -> np.ndarray:
    """Transfer + expand a bits_fetch_begin token into (K, Z, Y, X) bool."""
    import time as _time
    from multitalent_tpu.utils.alloc import fast_empty
    trace = os.environ.get("MTTPU_FETCH_TRACE") == "1"
    if token[0] == "words":
        _, k, wtoken = token
        return unpack_class_bits(rle_fetch_finish(wtoken), k)
    _, shape, cnt, first, idx_dev, payload_dev = token
    n = int(np.prod(shape))
    m = -(-n // _BITS_BLK)
    t0 = _time.time()
    idx = np.asarray(idx_dev)
    t1 = _time.time()
    payload = np.asarray(payload_dev)
    if trace:
        print(f"# bits_finish: idx {t1-t0:.3f}s payload "
              f"{_time.time()-t1:.3f}s", flush=True)
        t1 = _time.time()
    valid = idx < m
    bits = np.unpackbits(np.ascontiguousarray(payload[valid]).view(np.uint8),
                         bitorder="little").reshape(-1, _BITS_BLK)
    row, col = np.nonzero(bits)
    starts = (idx[valid][row].astype(np.int64) * _BITS_BLK + col)
    starts = starts[starts < n].astype(np.int32)
    assert starts.shape[0] == cnt, (starts.shape[0], cnt)
    if trace:
        t2 = _time.time()
        print(f"# bits_finish: decode {t2-t1:.3f}s", flush=True)
    # np.zeros = calloc: zero pages stay untouched until a foreground run
    # lands on them, so the expansion is O(foreground bytes). A dense
    # memset-per-run expansion into fast_empty paid 3-6 s of page-touch per
    # (47,256,320,320) volume — the last serialized piece of the fetch.
    out = np.zeros((n,), np.uint8)
    if trace:
        t3 = _time.time()
        print(f"# bits_finish: alloc {t3-t2:.3f}s", flush=True)
    if not native.rle_fill_ones(starts, n, first, out):
        lengths = np.diff(np.append(starts, n))
        vals = np.where(np.arange(cnt) % 2 == 0, first, 1 - first)
        out[:] = np.repeat(vals.astype(np.uint8), lengths)
    if trace:
        print(f"# bits_finish: expand {_time.time()-t3:.3f}s", flush=True)
    return out.view(np.bool_).reshape(shape)


def unpack_class_bits(packed_zyxw: np.ndarray, num_classes: int) -> np.ndarray:
    """uint32 bit words (Z, Y, X, ceil(K/32)) -> bool masks (K, Z, Y, X);
    inverse of the device-side packing in finalize_packed. Native C expansion
    (native/cc3d.cpp unpack_class_bits): the numpy np.unpackbits +
    strided-astype chain costs ~100 s per (256,320,320,47) volume on a slow
    host core, the single-pass blocked C loop ~2 s."""
    from multitalent_tpu import native
    out = native.unpack_class_bits(packed_zyxw, num_classes)
    if out is not None:
        return out
    packed_zyxw = np.ascontiguousarray(packed_zyxw)
    bits = np.unpackbits(packed_zyxw.view(np.uint8), axis=-1,
                         bitorder="little")
    return np.moveaxis(bits[..., :num_classes].astype(bool), -1, 0)


def segmentation_from_probabilities(probs_kzyx: np.ndarray,
                                    regions_class_order=None) -> np.ndarray:
    """argmax labels, or thresholded region channels written in regions_class_order
    (neural_network.py:405-417)."""
    if regions_class_order is None:
        return np.argmax(probs_kzyx, axis=0).astype(np.int32)
    seg = np.zeros(probs_kzyx.shape[1:], np.int32)
    for i, c in enumerate(regions_class_order):
        seg[probs_kzyx[i] > 0.5] = c
    return seg
