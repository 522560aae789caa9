"""Space-to-depth packed convolution rewrites (ops/packed_conv.py, ops/packed_unet.py).

Every packed op must be numerically equivalent (fp32) to its canonical XLA/flax
counterpart — packing is an execution-schedule change, never a model change.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn
from jax import lax

from multitalent_tpu.models.generic_unet import GenericUNet
from multitalent_tpu.ops import packed_conv as pc
from multitalent_tpu.ops.packed_unet import (make_inference_apply_fn,
                                             packable_stages,
                                             packed_unet_forward)

rng = np.random.RandomState(42)


def conv3d_same(x, w, strides=(1, 1, 1)):
    pad = tuple(((k - 1) // 2, (k - 1) // 2) for k in w.shape[:3])
    return lax.conv_general_dilated(
        x, w, strides, pad, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def test_space_to_depth_roundtrip():
    x = jnp.asarray(rng.randn(2, 4, 8, 12, 3).astype(np.float32))
    assert np.allclose(pc.depth_to_space_yx(pc.space_to_depth_yx(x)), x)


FACTOR_SETS = [(2, 2), (1, 2), (2, 1)]


@pytest.mark.parametrize("factors", FACTOR_SETS)
@pytest.mark.parametrize("k", [(3, 3, 3), (1, 3, 3), (1, 1, 1), (3, 1, 1)])
def test_packed_conv3d_matches_native(k, factors):
    x = jnp.asarray(rng.randn(1, 4, 8, 12, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(*k, 3, 5).astype(np.float32))
    ref = conv3d_same(x, w)
    got = pc.depth_to_space_yx(
        pc.packed_conv3d(pc.space_to_depth_yx(x, factors), w, factors=factors),
        factors)
    np.testing.assert_allclose(ref, got, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("factors", FACTOR_SETS)
@pytest.mark.parametrize("z_stride", [1, 2])
def test_packed_strided_conv_consumes_packing(z_stride, factors):
    x = jnp.asarray(rng.randn(1, 4, 8, 12, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 3, 6).astype(np.float32))
    ref = conv3d_same(x, w, strides=(z_stride, 2, 2))
    got = pc.packed_strided_conv3d(pc.space_to_depth_yx(x, factors), w,
                                   z_stride=z_stride, factors=factors)
    assert ref.shape == got.shape
    np.testing.assert_allclose(ref, got, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("out_factors", FACTOR_SETS)
@pytest.mark.parametrize("factors", [(2, 2), (1, 2)])
@pytest.mark.parametrize("z_stride", [1, 2])
def test_packed_strided_conv_packed_output(z_stride, factors, out_factors):
    """out_factors: the strided conv emits the next stage's packing directly
    — must equal space_to_depth of the unpacked strided output, including
    under mirror-TTA flipped-world padding."""
    x = jnp.asarray(rng.randn(1, 4, 8, 16, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 3, 6).astype(np.float32))
    xp = pc.space_to_depth_yx(x, factors)
    ref = pc.space_to_depth_yx(
        pc.packed_strided_conv3d(xp, w, z_stride=z_stride, factors=factors),
        out_factors)
    got = pc.packed_strided_conv3d(xp, w, z_stride=z_stride, factors=factors,
                                   out_factors=out_factors)
    assert ref.shape == got.shape
    np.testing.assert_allclose(ref, got, atol=2e-5, rtol=1e-4)
    # prepared-weight path agrees
    prep = pc.prepare_packed_strided_conv3d(w, xp.shape, z_stride=z_stride,
                                            factors=factors,
                                            out_factors=out_factors)
    got2 = pc.packed_strided_conv3d(xp, w, z_stride=z_stride, factors=factors,
                                    out_factors=out_factors, prepared=prep)
    np.testing.assert_allclose(ref, got2, atol=2e-5, rtol=1e-4)
    # flipped-world padding composes with packed output
    for flip in [(2,), (1, 2)]:
        wf = jnp.flip(w, axis=[a for a in flip])
        flipped_in = jnp.flip(x, axis=[a + 1 for a in flip])
        ref_f = pc.space_to_depth_yx(
            jnp.flip(conv3d_same(flipped_in, w, strides=(z_stride, 2, 2)),
                     axis=[a + 1 for a in flip]), out_factors)
        got_f = pc.packed_strided_conv3d(
            xp, wf, z_stride=z_stride, factors=factors, flip=flip,
            out_factors=out_factors)
        np.testing.assert_allclose(ref_f, got_f, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("factors", FACTOR_SETS)
@pytest.mark.parametrize("z_stride", [1, 2])
def test_packed_transpose_matches_flax(z_stride, factors):
    """flax ConvTranspose (kernel==stride, VALID) vs the packed rewrite — the
    decoder's re-entry into packed space (generic_UNet.py:296-300 analog)."""
    x = jnp.asarray(rng.randn(1, 4, 8, 12, 6).astype(np.float32))
    ks = (z_stride, 2, 2)
    mod = nn.ConvTranspose(features=3, kernel_size=ks, strides=ks,
                           padding="VALID", use_bias=False)
    params = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x)
    got = pc.depth_to_space_yx(
        pc.packed_conv_transpose3d(x, params["params"]["kernel"],
                                   z_stride=z_stride, factors=factors),
        factors)
    assert ref.shape == got.shape
    np.testing.assert_allclose(ref, got, atol=2e-5, rtol=1e-4)


def test_packed_pointwise_and_instance_norm():
    x = jnp.asarray(rng.randn(2, 4, 8, 8, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 1, 1, 3, 7).astype(np.float32))
    b = jnp.asarray(rng.randn(7).astype(np.float32))
    ref = conv3d_same(x, w) + b
    got = pc.depth_to_space_yx(pc.packed_pointwise_conv3d(
        pc.space_to_depth_yx(x), w, jnp.tile(b, pc.P)))
    np.testing.assert_allclose(ref, got, atol=2e-5, rtol=1e-4)
    # flat path (TPU default): block-diagonal single dot, exact — the extra
    # products are exact zeros
    got_flat = pc.depth_to_space_yx(pc.packed_pointwise_conv3d(
        pc.space_to_depth_yx(x), w, jnp.tile(b, pc.P), flat=True))
    np.testing.assert_allclose(ref, got_flat, atol=2e-5, rtol=1e-4)

    scale = jnp.asarray(rng.randn(3).astype(np.float32))
    bias = jnp.asarray(rng.randn(3).astype(np.float32))
    xf = x
    mean = xf.mean(axis=(1, 2, 3), keepdims=True)
    var = jnp.square(xf - mean).mean(axis=(1, 2, 3), keepdims=True)
    refn = (xf - mean) * lax.rsqrt(var + 1e-5) * scale + bias
    refn = jnp.where(refn >= 0, refn, refn * 0.01)
    gotn = pc.depth_to_space_yx(pc.packed_instance_norm(
        pc.space_to_depth_yx(x), scale, bias, negative_slope=0.01))
    np.testing.assert_allclose(refn, gotn, atol=2e-5, rtol=1e-4)


def _unet(pools, ds=False, base=4, dtype=jnp.float32):
    return GenericUNet(input_channels=1, base_num_features=base, num_classes=5,
                       pool_op_kernel_sizes=pools,
                       conv_kernel_sizes=((3, 3, 3),) * (len(pools) + 1),
                       deep_supervision=ds, dtype=dtype)


@pytest.mark.parametrize("pools,patch,pmc", [
    # the MultiTalent pool topology scaled down, all stages packed (3-stage:
    # the deepest compile of the suite -> slow; the production-policy and
    # anisotropic cases below keep fast-gate coverage of the same machinery)
    pytest.param((((2, 2, 2),) * 2 + ((1, 2, 2),)), (8, 16, 16), 256,
                 marks=pytest.mark.slow),
    # production policy: stage 0 only
    ((((2, 2, 2),) * 2 + ((1, 2, 2),)), (8, 16, 16), 128),
    # anisotropic first pool
    (((1, 2, 2), (2, 2, 2)), (4, 8, 8), 256),
])
def test_packed_unet_forward_matches_apply(pools, patch, pmc):
    model = _unet(pools)
    x = jnp.asarray(rng.randn(2, *patch, 1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    # perturb so every norm affine/bias is exercised away from init
    params = jax.tree_util.tree_map(
        lambda p: p + 0.1 * jnp.asarray(rng.randn(*p.shape).astype(np.float32)),
        params)
    assert packable_stages(model, patch, pmc) > 0
    ref = model.apply({"params": params}, x, deep_supervision=False)
    got = packed_unet_forward(model, params, x, pack_max_channels=pmc)
    assert ref.shape == got.shape
    scale = float(jnp.abs(ref).max()) + 1e-8
    err = float(jnp.abs(ref - got).max()) / scale
    if err < 1e-4:
        return
    # Random perturbed nets can be ill-conditioned (InstanceNorm variance near
    # epsilon amplifies fp32 reduction-order differences exponentially through
    # the stages). Judge against an fp64 ground truth: packed must be no
    # farther from truth than the plain fp32 path, up to a small factor.
    try:
        jax.config.update("jax_enable_x64", True)
        p64 = jax.tree_util.tree_map(lambda p: jnp.asarray(np.asarray(p),
                                                           jnp.float64), params)
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        model64 = _unet(pools, dtype=jnp.float64)
        ref64 = np.asarray(model64.apply({"params": p64}, x64,
                                         deep_supervision=False))
    finally:
        jax.config.update("jax_enable_x64", False)
    err_plain = np.abs(np.asarray(ref, np.float64) - ref64).max() / scale
    err_packed = np.abs(np.asarray(got, np.float64) - ref64).max() / scale
    assert err_packed <= max(3 * err_plain, 1e-4), (err_packed, err_plain)


def test_mixed_factor_stage_policy():
    """base 40 with pack_max_channels=128: stage0 runs (1,2)-packed (2*40=80
    fits, 4*40 overshoots) and deeper stages unpacked — the mixed-factor
    production policy for the C=60 stages of base-30 nets (pure policy
    check, no compiles)."""
    from multitalent_tpu.ops.packed_unet import stage_factors
    pools = ((2, 2, 2), (1, 2, 2))
    model = _unet(pools, base=40)
    patch = (4, 8, 8)
    assert stage_factors(model, patch, 128) == [(1, 2), (1, 1)]


@pytest.mark.slow  # two full forward compiles just for the mixed-factor case
def test_packed_unet_mixed_factor_stages():
    """Forward parity under the mixed-factor policy asserted above."""
    from multitalent_tpu.ops.packed_unet import stage_factors
    pools = ((2, 2, 2), (1, 2, 2))
    model = _unet(pools, base=40)
    patch = (4, 8, 8)
    assert stage_factors(model, patch, 128) == [(1, 2), (1, 1)]
    x = jnp.asarray(rng.randn(1, *patch, 1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(5), x)["params"]
    ref = model.apply({"params": params}, x, deep_supervision=False)
    got = packed_unet_forward(model, params, x, pack_max_channels=128)
    assert ref.shape == got.shape
    np.testing.assert_allclose(ref, got, atol=5e-5, rtol=1e-3)


def test_packed_unet_deep_supervision_and_fallbacks():
    pools = ((2, 2, 2), (1, 2, 2))
    model = _unet(pools, ds=True)
    x = jnp.asarray(rng.randn(1, 4, 8, 8, 1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    refs = model.apply({"params": params}, x, deep_supervision=True)
    gots = packed_unet_forward(model, params, x, deep_supervision=True)
    assert len(refs) == len(gots)
    for r, g in zip(refs, gots):
        assert r.shape == g.shape
        np.testing.assert_allclose(r, g, atol=5e-5, rtol=1e-3)
    # incompatible pool topology falls back to model.apply exactly
    model2 = _unet(((2, 2, 1), (2, 2, 2)))
    x2 = jnp.asarray(rng.randn(1, 8, 8, 8, 1).astype(np.float32))
    params2 = model2.init(jax.random.PRNGKey(2), x2)["params"]
    assert packable_stages(model2, (8, 8, 8)) == 0
    ref2 = model2.apply({"params": params2}, x2, deep_supervision=False)
    got2 = packed_unet_forward(model2, params2, x2)
    np.testing.assert_array_equal(ref2, got2)


def test_make_inference_apply_fn_selects_packed(monkeypatch):
    model = _unet(((2, 2, 2),))
    x = jnp.asarray(rng.randn(1, 4, 8, 8, 1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    # force-on (the platform default is on only for TPU backends)
    monkeypatch.setenv("MTTPU_PACKED_CONV", "1")
    fn = make_inference_apply_fn(model)
    ref = model.apply({"params": params}, x, deep_supervision=False)
    np.testing.assert_allclose(fn(params, x), ref, atol=5e-5, rtol=1e-3)
    # env kill-switch forces the plain path
    monkeypatch.setenv("MTTPU_PACKED_CONV", "0")
    fn_off = make_inference_apply_fn(model)
    np.testing.assert_array_equal(fn_off(params, x), ref)
    # non-default norm is not packable -> plain path
    model_bn = GenericUNet(input_channels=1, base_num_features=4, num_classes=5,
                           pool_op_kernel_sizes=((2, 2, 2),),
                           conv_kernel_sizes=((3, 3, 3),) * 2,
                           deep_supervision=False, dtype=jnp.float32,
                           norm="batch")
    monkeypatch.delenv("MTTPU_PACKED_CONV", raising=False)
    fn_bn = make_inference_apply_fn(model_bn)
    params_bn = model_bn.init(jax.random.PRNGKey(0), x)["params"]
    ref_bn = model_bn.apply({"params": params_bn}, x, deep_supervision=False)
    np.testing.assert_array_equal(fn_bn(params_bn, x), ref_bn)


def test_packed_train_forward_grads_match_fast(monkeypatch):
    """Fast-gate grad signal: grads through the packed forward equal grads
    through model.apply on a single-stage net (one encoder + bottleneck +
    one decoder — every packed-train op kind, a quarter of the compile)."""
    _check_packed_train_grads(monkeypatch, pools=((2, 2, 2),), ds=False)


@pytest.mark.slow  # two deep-supervision grad graphs ~50 s to compile on CPU
def test_packed_train_forward_grads_match(monkeypatch):
    """Training integration: grads through the packed forward equal grads
    through model.apply (fp32, deep supervision on, two pool stages)."""
    _check_packed_train_grads(monkeypatch, pools=((2, 2, 2), (1, 2, 2)),
                              ds=True)


@pytest.mark.slow  # 6-pool anisotropic topology, multi-minute CPU compile
def test_packed_forward_prostate_topology(monkeypatch):
    """Task005_Prostate's plan geometry (two leading 1x3x3 stages, six pools
    [1,2,2]x2 [2,2,2]x2 [1,2,2]x2, 2 modalities) through the packed training
    forward: parity vs model.apply + grads flow (regression cover for the
    prostate bench config)."""
    from functools import partial

    from multitalent_tpu.augment.pipeline import ds_scales_from_pools
    from multitalent_tpu.models.generic_unet import GenericUNet
    from multitalent_tpu.ops.packed_unet import make_train_forward_fn
    from multitalent_tpu.training.losses import (dc_and_ce_loss,
                                                 deep_supervision_loss,
                                                 ds_loss_weights)

    monkeypatch.setenv("MTTPU_PACKED_TRAIN", "1")
    pools = ((1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2), (1, 2, 2), (1, 2, 2))
    convs = ((1, 3, 3), (1, 3, 3)) + ((3, 3, 3),) * 5
    # fp32: tight parity (bf16 through six packed stages carries ~8% worst-
    # voxel accumulation noise, which would mask real bugs)
    model = GenericUNet(input_channels=2, base_num_features=8, num_classes=3,
                        pool_op_kernel_sizes=pools, conv_kernel_sizes=convs,
                        deep_supervision=True, dtype=jnp.float32)
    patch = (8, 64, 64)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, *patch, 2)))["params"]
    fwd = make_train_forward_fn(model)
    x = jnp.asarray(rng.randn(2, *patch, 2).astype(np.float32))
    outs = fwd(params, x)
    ref = model.apply({"params": params}, x, deep_supervision=True)
    for a, b in zip(outs, ref):
        bf = np.asarray(b, np.float32)
        d = np.abs(np.asarray(a, np.float32) - bf)
        scale = np.abs(bf).max() + 1e-6
        assert d.max() < 5e-3 * scale, (d.max(), scale)

    ws = [float(w) for w in ds_loss_weights(len(pools), mask_lowest=True)]
    scales = ds_scales_from_pools(pools)
    tgt = [jnp.asarray(rng.randint(0, 3, (
        2, *[max(1, int(round(p * s))) for p, s in zip(patch, sc)]))
        .astype(np.float32)) for sc in scales[:len(ws)]]

    def loss_fn(p):
        return deep_supervision_loss(
            fwd(p, x), tgt, partial(dc_and_ce_loss, batch_dice=False), ws)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g, np.float32)).all()
               for g in jax.tree_util.tree_leaves(grads))


def _check_packed_train_grads(monkeypatch, pools, ds):
    from multitalent_tpu.ops.packed_unet import make_train_forward_fn
    monkeypatch.setenv("MTTPU_PACKED_TRAIN", "1")
    model = _unet(pools, ds=ds)
    x = jnp.asarray(rng.randn(2, 4, 8, 8, 1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(3), x)["params"]

    def _as_list(outs):
        return outs if isinstance(outs, (list, tuple)) else [outs]

    tgt = [jnp.asarray(rng.randn(*np.asarray(s).shape).astype(np.float32))
           for s in _as_list(model.apply({"params": params}, x,
                                         deep_supervision=ds))]

    def loss_apply(p):
        outs = _as_list(model.apply({"params": p}, x, deep_supervision=ds))
        return sum(jnp.mean((o - t) ** 2) for o, t in zip(outs, tgt))

    fwd = make_train_forward_fn(model)

    def loss_packed(p):
        outs = _as_list(fwd(p, x))
        return sum(jnp.mean((o - t) ** 2) for o, t in zip(outs, tgt))

    # one jitted program for both grad graphs: eager jax.grad pays per-op
    # dispatch + compile over hundreds of ops on the 1-core CPU host
    g_ref, g_pk = jax.jit(lambda p: (jax.grad(loss_apply)(p),
                                     jax.grad(loss_packed)(p)))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pk = jax.tree_util.tree_leaves(g_pk)
    # normalize by the global gradient scale: conv biases feeding InstanceNorm
    # are mathematically dead (mean subtraction cancels them — true grad 0), so
    # per-leaf relative error there is fp-noise divided by fp-noise
    gscale = max(float(jnp.abs(a).max()) for _, a in flat_ref) + 1e-8
    for (path, a), b in zip(flat_ref, flat_pk):
        err = float(jnp.abs(a - b).max()) / gscale
        assert err < 5e-4, (jax.tree_util.keystr(path), err)


def _flip_equivalence_check(combos, pools):
    """Mirror-TTA in the weights: packed_unet_forward(..., flip_combo=axes)
    must equal flip(forward(flip(x))) on those axes — the algebraic identity
    behind the sliding-window engine's flip-free TTA loop (tap-reversed
    kernels + mirrored strided-conv padding, flipped_strided_pads).
    Differences are reduction-order noise only (the norm chain runs fp32)."""
    import os
    from multitalent_tpu.ops.packed_unet import packed_unet_forward

    os.environ["MTTPU_PACKED_CONV"] = "1"
    try:
        model = _unet(pools, base=4)
        patch = (8, 16, 16)
        rng = np.random.RandomState(0)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, *patch, 1)))["params"]
        x = jnp.asarray(rng.randn(2, *patch, 1).astype(np.float32))
        fwd = jax.jit(lambda p, v, fc: packed_unet_forward(
            model, p, v, deep_supervision=False, flip_combo=fc),
            static_argnames=("fc",))
        for combo in combos:
            axes = [a + 1 for a in combo]
            ref = jnp.flip(fwd(params, jnp.flip(x, axes), ()), axes)
            out = fwd(params, x, tuple(combo))
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-3, err_msg=str(combo))
    finally:
        os.environ.pop("MTTPU_PACKED_CONV", None)


def test_weight_flip_forward_equivalence():
    # the full 3-axis flip exercises the asymmetric strided pads on the
    # unpacked z axis AND both packed axes in one compile; per-axis combos
    # run in the slow gate
    _flip_equivalence_check([(0, 1, 2)], ((2, 2, 2), (1, 2, 2)))


@pytest.mark.slow
def test_weight_flip_forward_equivalence_all_combos():
    _flip_equivalence_check([(0,), (1,), (2,), (0, 1), (0, 2), (1, 2)],
                            ((2, 2, 2), (1, 2, 2), (2, 2, 2)))


def test_engine_weight_flip_matches_activation_flip():
    """The engine's flip-in-weights TTA accumulation (MTTPU_SW_FLIPW=1,
    default) must reproduce the activation-flip path."""
    import os
    from multitalent_tpu.ops.sliding_window import SlidingWindowPredictor
    from multitalent_tpu.ops.packed_unet import (
        make_inference_apply_fn, make_packed_inference_apply_fn)

    os.environ["MTTPU_PACKED_CONV"] = "1"
    try:
        pools = ((2, 2, 2),)
        model = _unet(pools, base=8)
        patch = (8, 8, 8)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, *patch, 1)))["params"]
        apply_fn = make_inference_apply_fn(model)
        pfn, pfac = make_packed_inference_apply_fn(model, patch)
        assert getattr(pfn, "supports_weight_flip", False)
        base = dict(patch_size=patch, in_channels=1, num_classes=5,
                    nonlin="sigmoid", step_size=0.5, do_mirroring=True,
                    mirror_axes=(0, 2), use_gaussian=True)
        vol = np.random.RandomState(7).randn(1, 10, 12, 10).astype(np.float32)
        os.environ["MTTPU_SW_FLIPW"] = "0"
        ref = SlidingWindowPredictor(apply_fn, packed_apply=(pfn, pfac),
                                     **base)(params, vol)
        os.environ["MTTPU_SW_FLIPW"] = "1"
        out = SlidingWindowPredictor(apply_fn, packed_apply=(pfn, pfac),
                                     **base)(params, vol)
        np.testing.assert_allclose(out, ref, atol=2e-3)
    finally:
        os.environ.pop("MTTPU_SW_FLIPW", None)
        os.environ.pop("MTTPU_PACKED_CONV", None)


def test_packout_strided_toggle_parity(monkeypatch):
    """MTTPU_PACKOUT_STRIDED bisect switch: the packed-output strided conv
    (next stage's packing baked into the weight) and the unpack-then-repack
    formulation agree at net level — guards the bias placement (tile-bias in
    packed space vs bias-then-space-to-depth) in packed_unet_forward."""
    pools = (((2, 2, 2),) * 2 + ((1, 2, 2),))
    model = _unet(pools)
    patch = (8, 16, 16)
    x = jnp.asarray(rng.randn(2, *patch, 1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.1 * jnp.asarray(rng.randn(*p.shape).astype(np.float32)),
        params)
    outs = {}
    for env in ("1", "0"):
        monkeypatch.setenv("MTTPU_PACKOUT_STRIDED", env)
        outs[env] = np.asarray(
            packed_unet_forward(model, params, x, pack_max_channels=256))
    scale = np.abs(outs["1"]).max() + 1e-8
    assert np.abs(outs["1"] - outs["0"]).max() / scale < 1e-4
