"""Sliding-window engine tests.

Step-grid cases follow the reference's only unit test
(tests/test_steps_for_sliding_window_prediction.py): pinned hand-verified grids +
property tests over random combinations, plus functional equivalence of the tiled
jitted predictor against a dense whole-volume forward."""
import numpy as np
import pytest

from multitalent_tpu.ops.sliding_window import (SlidingWindowPredictor,
                                                compute_steps_for_sliding_window,
                                                get_gaussian_importance_map,
                                                mirror_combinations, pad_to_patch,
                                                segmentation_from_probabilities)


def _verify_steps(steps, patch_size, image_size, step_size):
    for dim in range(len(steps)):
        s = steps[dim]
        assert s[0] == 0
        assert s[-1] + patch_size[dim] == image_size[dim] or len(s) == 1
        if len(s) == 1:
            assert patch_size[dim] == image_size[dim] or s[0] + patch_size[dim] >= image_size[dim]
        for i in range(1, len(s)):
            # no gaps, spacing <= target step
            assert s[i] <= s[i - 1] + patch_size[dim]
            assert s[i] - s[i - 1] <= patch_size[dim] * step_size + 1


def test_manually_verified_step_grids():
    assert compute_steps_for_sliding_window((64, 130), (128, 260), 0.5) == \
        [[0, 32, 64], [0, 65, 130]]
    assert compute_steps_for_sliding_window((64, 130), (128, 260), 1.0) == \
        [[0, 64], [0, 130]]
    assert compute_steps_for_sliding_window((128, 128, 128), (146, 176, 148), 0.5) == \
        [[0, 18], [0, 48], [0, 20]]
    assert compute_steps_for_sliding_window((80, 192, 160), (130, 320, 244), 0.5) == \
        [[0, 25, 50], [0, 64, 128], [0, 42, 84]]
    assert compute_steps_for_sliding_window((80, 192, 160), (130, 320, 244), 0.75) == \
        [[0, 50], [0, 128], [0, 84]]
    assert compute_steps_for_sliding_window((128,) * 3, (424, 456, 456), 0.5) == \
        [[0, 59, 118, 178, 237, 296],
         [0, 55, 109, 164, 219, 273, 328],
         [0, 55, 109, 164, 219, 273, 328]]
    assert compute_steps_for_sliding_window((40, 56, 40), (40, 56, 40), 0.5) == \
        [[0], [0], [0]]
    assert compute_steps_for_sliding_window((64, 192, 192), (94, 308, 308), 0.5) == \
        [[0, 30], [0, 58, 116], [0, 58, 116]]


def test_random_step_grid_invariants():
    rng = np.random.RandomState(0)
    for _ in range(500):
        dim = rng.choice((2, 3))
        patch_size = tuple(rng.randint(16, 256, dim))
        image_size = tuple(max(rng.randint(i // 2, i * 4), i) for i in patch_size)
        step_size = rng.uniform(0.01, 1)
        steps = compute_steps_for_sliding_window(patch_size, image_size, step_size)
        _verify_steps(steps, patch_size, image_size, step_size)


def test_gaussian_importance_map():
    g = get_gaussian_importance_map((8, 8, 8))
    assert g.shape == (8, 8, 8)
    assert np.isclose(g.max(), 1.0)
    assert (g > 0).all()
    # maximum at the center voxel
    assert g[4, 4, 4] == g.max()


def test_pad_to_patch_roundtrip():
    vol = np.random.RandomState(0).randn(5, 9, 17, 2).astype(np.float32)
    padded, slicer = pad_to_patch(vol, (8, 8, 8))
    assert padded.shape == (8, 9, 17, 2)
    np.testing.assert_array_equal(padded[tuple(slicer) + (slice(None),)], vol)


def test_mirror_combinations():
    assert mirror_combinations(()) == [()]
    assert len(mirror_combinations((0, 1, 2))) == 8
    assert () in mirror_combinations((0, 1))


def test_tiled_predictor_matches_dense_linear_model():
    """With a translation-equivariant voxelwise model, gaussian-weighted tiling must
    reproduce the dense result exactly (weights cancel in the normalization)."""
    import jax.numpy as jnp

    w = jnp.asarray(np.random.RandomState(1).randn(2, 3).astype(np.float32))

    def apply_fn(params, batch):
        return batch @ params  # (B, Z, Y, X, 2) -> (B, Z, Y, X, 3)

    pred = SlidingWindowPredictor(apply_fn, (8, 8, 8), in_channels=2, num_classes=3,
                                  nonlin="softmax", step_size=0.5,
                                  do_mirroring=False, use_gaussian=True)
    vol = np.random.RandomState(2).randn(2, 11, 14, 9).astype(np.float32)
    out = pred(w, vol)
    assert out.shape == (3, 11, 14, 9)

    import jax
    dense = jax.nn.softmax(
        jnp.moveaxis(jnp.asarray(vol), 0, -1) @ w, axis=-1)
    dense = np.moveaxis(np.asarray(dense), -1, 0)
    # probabilities are carried in bf16 inside the engine (fp32 accumulation)
    np.testing.assert_allclose(out, dense, atol=5e-3)
    # probabilities sum to one everywhere
    np.testing.assert_allclose(out.sum(0), 1.0, atol=5e-3)


def test_tiled_predictor_mirror_tta_symmetric_model():
    """Mirror TTA with a flip-equivariant (voxelwise) model must equal no-TTA."""
    import jax.numpy as jnp
    w = jnp.asarray(np.random.RandomState(1).randn(1, 2).astype(np.float32))

    def apply_fn(params, batch):
        return batch @ params

    base = dict(patch_size=(8, 8, 8), in_channels=1, num_classes=2,
                nonlin="sigmoid", step_size=0.5, use_gaussian=True)
    vol = np.random.RandomState(3).randn(1, 10, 10, 10).astype(np.float32)
    with_tta = SlidingWindowPredictor(apply_fn, do_mirroring=True, **base)(w, vol)
    without = SlidingWindowPredictor(apply_fn, do_mirroring=False, **base)(w, vol)
    np.testing.assert_allclose(with_tta, without, atol=5e-3)


def test_uneven_tta_chunk_split_matches_even():
    """tta_chunk=3 over 8 mirror combos (chunks 3+3+2: a short NATURAL-size
    tail chunk) must match tta_chunk=4 (even 4+4 split). Uses a spatially
    asymmetric conv model so each flip combo genuinely contributes a
    different prediction (a voxelwise model would hide tail-chunk bugs)."""
    import jax.numpy as jnp
    from jax import lax

    w = jnp.asarray(np.random.RandomState(7).randn(3, 3, 3, 1, 2)
                    .astype(np.float32))

    def apply_fn(params, batch):
        return lax.conv_general_dilated(
            batch.astype(params.dtype), params, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    base = dict(patch_size=(8, 8, 8), in_channels=1, num_classes=2,
                nonlin="sigmoid", step_size=0.5, do_mirroring=True,
                mirror_axes=(0, 1, 2), use_gaussian=True)
    vol = np.random.RandomState(8).randn(1, 10, 12, 10).astype(np.float32)
    out3 = SlidingWindowPredictor(apply_fn, tta_chunk=3, **base)(w, vol)
    out4 = SlidingWindowPredictor(apply_fn, tta_chunk=4, **base)(w, vol)
    np.testing.assert_allclose(out3, out4, atol=5e-3)


def test_segmentation_from_probabilities():
    probs = np.zeros((3, 2, 2, 2), np.float32)
    probs[1, 0] = 0.9
    probs[2, 1] = 0.8
    seg = segmentation_from_probabilities(probs)
    assert seg.shape == (2, 2, 2)
    assert (seg[0] == 1).all() and (seg[1] == 2).all()
    # region mode: later channels overwrite earlier ones (regions_class_order)
    rp = np.zeros((2, 2, 2, 2), np.float32)
    rp[0] = 0.9  # region 0 everywhere
    rp[1, 0] = 0.7  # region 1 on slice 0
    seg = segmentation_from_probabilities(rp, regions_class_order=(1, 2))
    assert (seg[0] == 2).all() and (seg[1] == 1).all()


def test_tiled_predictor_with_real_unet():
    """End-to-end: GenericUNet through the tiled engine produces valid shapes."""
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.models.generic_unet import GenericUNet

    net = GenericUNet(input_channels=1, base_num_features=4, num_classes=3,
                      pool_op_kernel_sizes=((2, 2, 2),),
                      conv_kernel_sizes=((3, 3, 3), (3, 3, 3)),
                      deep_supervision=False, dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8, 8, 8, 1)))["params"]

    def apply_fn(p, batch):
        return net.apply({"params": p}, batch, deep_supervision=False)

    pred = SlidingWindowPredictor(apply_fn, (8, 8, 8), in_channels=1, num_classes=3,
                                  do_mirroring=True, step_size=0.5)
    vol = np.random.RandomState(0).randn(1, 12, 10, 9).astype(np.float32)
    out = pred(params, vol)
    assert out.shape == (3, 12, 10, 9)
    np.testing.assert_allclose(np.asarray(out).sum(0), 1.0, atol=5e-3)


def test_tiled_predictor_multi_device_sharding():
    """Tiles sharded round-robin over devices must reproduce the single-device
    result exactly."""
    import jax
    import jax.numpy as jnp
    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs multiple devices")
    w = jnp.asarray(np.random.RandomState(1).randn(2, 3).astype(np.float32))

    def apply_fn(params, batch):
        return batch @ params

    base = dict(patch_size=(8, 8, 8), in_channels=2, num_classes=3,
                nonlin="softmax", step_size=0.5, do_mirroring=False,
                use_gaussian=True)
    vol = np.random.RandomState(2).randn(2, 16, 16, 12).astype(np.float32)
    single = SlidingWindowPredictor(apply_fn, **base)(w, vol)
    multi = SlidingWindowPredictor(apply_fn, devices=devices[:4], **base)(w, vol)
    # fp16 accumulators round in a different order when sharded
    np.testing.assert_allclose(multi, single, atol=5e-3)


def test_bitpacked_region_fetch_matches_probs_path():
    """finalize_packed + unpack_class_bits == (probs > 0.5): the low-bandwidth
    device->host path must be bit-identical to thresholding fetched fp16."""
    import jax.numpy as jnp
    from multitalent_tpu.ops.sliding_window import (SlidingWindowPredictor,
                                                    unpack_class_bits)

    K = 5  # also exercises the K<32 padding path
    rngl = np.random.RandomState(3)
    wk = jnp.asarray(rngl.randn(1, K).astype(np.float32))

    def apply_fn(params, batch):
        return jnp.einsum("bzyxc,ck->bzyxk", batch, params)

    pred = SlidingWindowPredictor(apply_fn, (6, 6, 6), in_channels=1,
                                  num_classes=K, nonlin="sigmoid",
                                  tta_chunk=2)
    vol = rngl.randn(1, 8, 9, 10).astype(np.float32)
    probs = pred(wk, vol)
    masks = pred.predict_regions_packed(wk, vol)
    assert masks.shape == (K, 8, 9, 10) and masks.dtype == bool
    np.testing.assert_array_equal(masks, probs > 0.5)


def test_bits_fetch_matches_word_path():
    """The class-major bit-plane RLE transport (default) and the uint32 word
    transport (MTTPU_SW_BITS=0) must produce identical masks."""
    import os

    import jax.numpy as jnp
    from multitalent_tpu.ops.sliding_window import SlidingWindowPredictor

    K = 47  # two words, K%32 != 0
    rngl = np.random.RandomState(5)
    wk = jnp.asarray(rngl.randn(1, K).astype(np.float32))

    def apply_fn(params, batch):
        return jnp.einsum("bzyxc,ck->bzyxk", batch, params)

    pred = SlidingWindowPredictor(apply_fn, (6, 6, 6), in_channels=1,
                                  num_classes=K, nonlin="sigmoid",
                                  tta_chunk=2)
    vol = rngl.randn(1, 8, 9, 10).astype(np.float32)
    bits = pred.predict_regions_packed(wk, vol)
    os.environ["MTTPU_SW_BITS"] = "0"
    try:
        words = pred.predict_regions_packed(wk, vol)
    finally:
        os.environ.pop("MTTPU_SW_BITS", None)
    assert bits.shape == words.shape == (K, 8, 9, 10)
    np.testing.assert_array_equal(bits, words)


def test_bits_fetch_roundtrip_coherent_and_noise():
    """bits_fetch_begin/finish must reproduce the dense mask array exactly on
    coherent masks (RLE path) and fall back to the word transport on
    uncorrelated noise without changing the result."""
    import jax.numpy as jnp
    from multitalent_tpu.ops.sliding_window import (bits_fetch_begin,
                                                    bits_fetch_finish)

    rng = np.random.RandomState(9)
    # coherent at production run lengths (runs of ~6k elements, long past the
    # 256-element bitmap block scale); noise flips every few elements
    blocks = rng.rand(5, 4, 1, 1) > 0.5
    coherent = np.kron(blocks, np.ones((1, 4, 32, 48))).astype(np.uint8)
    noise = (rng.rand(5, 16, 32, 48) > 0.5).astype(np.uint8)
    for arr, expect_kind in ((coherent, "bits"), (noise, "words")):
        token = bits_fetch_begin(jnp.asarray(arr))
        assert token[0] == expect_kind
        got = bits_fetch_finish(token)
        assert got.dtype == bool
        np.testing.assert_array_equal(got, arr.astype(bool))


def test_flipw_tail_padding_and_tile_batch_clamp(monkeypatch):
    """A tile count that is not a multiple of the (clamped) tile batch must
    pad with zero-weight phantom tiles and still match the activation-flip
    path; MTTPU_SW_TILE_BATCH values that don't divide the group reshape
    (e.g. 7) are clamped to a power of two."""
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.models.generic_unet import GenericUNet
    from multitalent_tpu.ops.packed_unet import (
        make_inference_apply_fn, make_packed_inference_apply_fn)
    from multitalent_tpu.ops.sliding_window import SlidingWindowPredictor

    monkeypatch.setenv("MTTPU_PACKED_CONV", "1")
    model = GenericUNet(input_channels=1, base_num_features=8, num_classes=5,
                        pool_op_kernel_sizes=((2, 2, 2),),
                        conv_kernel_sizes=((3, 3, 3),) * 2,
                        deep_supervision=False, dtype=jnp.float32)
    patch = (8, 8, 8)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, *patch, 1)))["params"]
    apply_fn = make_inference_apply_fn(model)
    pfn, pfac = make_packed_inference_apply_fn(model, patch)
    base = dict(patch_size=patch, in_channels=1, num_classes=5,
                nonlin="sigmoid", step_size=0.5, do_mirroring=True,
                mirror_axes=(0,), use_gaussian=True)
    # (10, 14, 14) -> 2*3*3 = 18 tiles: not a multiple of tb=4 (tail group
    # carries 2 phantom tiles)
    vol = np.random.RandomState(11).randn(1, 10, 14, 14).astype(np.float32)
    monkeypatch.setenv("MTTPU_SW_FLIPW", "0")
    ref = SlidingWindowPredictor(apply_fn, packed_apply=(pfn, pfac),
                                 **base)(params, vol)
    monkeypatch.setenv("MTTPU_SW_FLIPW", "1")
    monkeypatch.setenv("MTTPU_SW_TILE_BATCH", "7")  # clamps to 4
    out = SlidingWindowPredictor(apply_fn, packed_apply=(pfn, pfac),
                                 **base)(params, vol)
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_unpack_class_bits_wide():
    """47-channel packing spans two uint32 words."""
    from multitalent_tpu.ops.sliding_window import unpack_class_bits
    rngl = np.random.RandomState(4)
    bits = rngl.rand(3, 4, 5, 47) > 0.5
    packed = np.zeros((3, 4, 5, 2), np.uint32)
    for k in range(47):
        packed[..., k // 32] |= bits[..., k].astype(np.uint32) << np.uint32(k % 32)
    out = unpack_class_bits(packed, 47)
    np.testing.assert_array_equal(out, np.moveaxis(bits, -1, 0))


def test_device_loop_matches_host_loop(monkeypatch):
    """The single-dispatch fori_loop runner (default) and the per-group host
    loop (MTTPU_SW_DEVICE_LOOP=0, used by the sharded path) must agree."""
    import jax.numpy as jnp
    from multitalent_tpu.ops.sliding_window import SlidingWindowPredictor

    rngl = np.random.RandomState(7)
    wk = jnp.asarray(rngl.randn(1, 3).astype(np.float32))

    def apply_fn(params, batch):
        return jnp.einsum("bzyxc,ck->bzyxk", batch, params)

    vol = rngl.randn(1, 9, 11, 13).astype(np.float32)

    def predict():
        pred = SlidingWindowPredictor(apply_fn, (6, 6, 6), in_channels=1,
                                      num_classes=3, nonlin="softmax",
                                      tta_chunk=4, exact=True)
        return np.asarray(pred(wk, vol))

    monkeypatch.setenv("MTTPU_SW_DEVICE_LOOP", "1")
    dev = predict()
    monkeypatch.setenv("MTTPU_SW_DEVICE_LOOP", "0")
    host = predict()
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_fetch_packed_rle_roundtrip():
    """Device-side RLE fetch must reproduce the dense packed array exactly —
    both on coherent masks (RLE path) and uncorrelated noise (dense
    fallback)."""
    import jax.numpy as jnp
    from multitalent_tpu.ops.sliding_window import fetch_packed_rle

    from multitalent_tpu.ops.sliding_window import (rle_fetch_begin,
                                                    rle_fetch_finish)

    rng = np.random.RandomState(3)
    # coherent: blocky runs
    blocks = rng.randint(0, 5, (6, 8, 4)).astype(np.uint32)
    coherent = np.kron(blocks, np.ones((4, 4, 8), np.uint32))
    for arr in (coherent, rng.randint(0, 2**31, (16, 16, 16)).astype(np.uint32)):
        packed = np.stack([arr, arr ^ 0xDEADBEEF], axis=-1).astype(np.uint32)
        got = fetch_packed_rle(jnp.asarray(packed))
        np.testing.assert_array_equal(got, packed)
        # the pipelined begin/finish split is byte-identical to the one-shot
        token = rle_fetch_begin(jnp.asarray(packed))
        np.testing.assert_array_equal(rle_fetch_finish(token), packed)


def _packed_engine_setup():
    """Shared setup for the packed-accumulation tests: a real packed
    GenericUNet (pfac (2,2)) plus the plain/packed apply fns."""
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.models.generic_unet import GenericUNet
    from multitalent_tpu.ops.packed_unet import (
        make_inference_apply_fn, make_packed_inference_apply_fn)

    pools = ((2, 2, 2), (1, 2, 2))
    model = GenericUNet(input_channels=1, base_num_features=8,
                        num_classes=5, pool_op_kernel_sizes=pools,
                        conv_kernel_sizes=((3, 3, 3),) * 3,
                        deep_supervision=False, dtype=jnp.float32)
    patch = (8, 16, 16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, *patch, 1)))["params"]
    apply_fn = make_inference_apply_fn(model)
    pfn, pfac = make_packed_inference_apply_fn(model, patch)
    assert pfn is not None and pfac == (2, 2)
    base = dict(patch_size=patch, in_channels=1, num_classes=5,
                nonlin="sigmoid", step_size=0.5, do_mirroring=True,
                use_gaussian=True)
    return params, apply_fn, (pfn, pfac), base


def test_packed_accumulation_matches_plain():
    """The packed-space accumulation path (apply_fn emitting space-to-depth
    packed logits + packed accumulators/gaussian/TTA-unflip) must reproduce
    the plain path bit-for-bit up to accumulator precision on a real packed
    GenericUNet forward."""
    import os

    os.environ["MTTPU_PACKED_CONV"] = "1"  # packed path is TPU-default only
    try:
        params, apply_fn, packed_apply, base = _packed_engine_setup()
        # z (unpacked) + x (packed) mirror axes: halves the XLA:CPU compile of
        # both engine programs vs (0,1,2); the y-axis unflip shares the packed
        # code path with x and runs in the slow odd-extent test's full combos
        base["mirror_axes"] = (0, 2)
        vol = np.random.RandomState(7).randn(1, 12, 32, 24).astype(np.float32)
        plain = SlidingWindowPredictor(apply_fn, **base)(params, vol)
        packed = SlidingWindowPredictor(apply_fn, packed_apply=packed_apply,
                                        **base)(params, vol)
        assert packed.shape == plain.shape == (5, 12, 32, 24)
        np.testing.assert_allclose(packed, plain, atol=2e-3)

        # bit-packed threshold export agrees wherever the probability is not
        # within accumulator precision of the 0.5 threshold: the packed
        # engine's f16 TTA sum (the same trade the reference's all_in_gpu
        # fp16 mode makes) may flip bits for probs within ~1e-3 of 0.5 —
        # plentiful on white-noise inputs, measure-zero on real volumes
        pp = SlidingWindowPredictor(apply_fn, packed_apply=packed_apply,
                                    **base)
        masks = pp.predict_regions_packed(params, vol)
        plain_np = np.asarray(plain, np.float32)
        decided = np.abs(plain_np - 0.5) > 2e-3
        np.testing.assert_array_equal(masks[decided], (plain_np > 0.5)[decided])
        assert decided.mean() > 0.95  # the check must still cover the volume
    finally:
        os.environ.pop("MTTPU_PACKED_CONV", None)


@pytest.mark.slow  # an extra volume shape = two more XLA:CPU compiles
def test_packed_accumulation_odd_extent_falls_back():
    """Odd X extent: packed offsets/dims don't divide the (2,2) factors, so
    the engine must silently fall back to the plain path and still match."""
    import os

    os.environ["MTTPU_PACKED_CONV"] = "1"
    try:
        params, apply_fn, packed_apply, base = _packed_engine_setup()
        vol_odd = np.random.RandomState(8).randn(1, 12, 32, 17).astype(
            np.float32)
        plain_o = SlidingWindowPredictor(apply_fn, **base)(params, vol_odd)
        packed_o = SlidingWindowPredictor(apply_fn, packed_apply=packed_apply,
                                          **base)(params, vol_odd)
        np.testing.assert_allclose(packed_o, plain_o, atol=2e-3)
    finally:
        os.environ.pop("MTTPU_PACKED_CONV", None)
