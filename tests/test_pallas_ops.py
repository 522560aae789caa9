"""Pallas kernel tests (interpret mode on the CPU test platform — the same code
path compiles natively on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multitalent_tpu.ops.fused_norm import fused_instance_norm_lrelu


def _ref_in_lrelu(x, scale, bias, negative_slope=1e-2, eps=1e-5):
    xf = np.asarray(x, np.float64)
    axes = tuple(range(1, xf.ndim - 1))
    mean = xf.mean(axis=axes, keepdims=True)
    var = xf.var(axis=axes, keepdims=True)
    y = (xf - mean) / np.sqrt(var + eps) * scale + bias
    return np.where(y >= 0, y, y * negative_slope)


@pytest.mark.parametrize("shape", [(2, 4, 8, 8, 6), (1, 40, 24, 3), (2, 37, 5)])
def test_fused_norm_matches_reference(shape):
    rng = np.random.RandomState(0)
    x = rng.randn(*shape).astype(np.float32) * 3 + 1
    c = shape[-1]
    scale = rng.rand(c).astype(np.float32) + 0.5
    bias = rng.randn(c).astype(np.float32)
    got = fused_instance_norm_lrelu(jnp.asarray(x), jnp.asarray(scale),
                                    jnp.asarray(bias), interpret=True)
    expect = _ref_in_lrelu(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), expect, atol=2e-4)


def test_fused_norm_bf16_io_fp32_stats():
    rng = np.random.RandomState(1)
    x = (rng.randn(1, 16, 16, 8) * 2).astype(jnp.bfloat16)
    scale = jnp.ones((8,), jnp.float32)
    bias = jnp.zeros((8,), jnp.float32)
    got = fused_instance_norm_lrelu(x, scale, bias, interpret=True)
    assert got.dtype == jnp.bfloat16
    expect = _ref_in_lrelu(np.asarray(x, np.float32), np.ones(8), np.zeros(8))
    np.testing.assert_allclose(np.asarray(got, np.float32), expect, atol=0.05)


def test_blocks_pallas_flag_parity(monkeypatch):
    """ConvNormAct with MTTPU_PALLAS_NORM=1 matches the plain XLA path bitwise-close,
    with an identical parameter tree."""
    from multitalent_tpu.models.blocks import ConvNormAct
    x = jnp.asarray(np.random.RandomState(2).randn(1, 6, 8, 8, 3), jnp.float32)
    block = ConvNormAct(features=5, kernel_size=(3, 3, 3), dtype=jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x)
    base = block.apply(params, x)

    monkeypatch.setenv("MTTPU_PALLAS_NORM", "1")
    params2 = block.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)
    fused = block.apply(params, x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=2e-5)


def test_dynamic_task_prioritization_loss():
    from multitalent_tpu.training.losses import dynamic_task_prioritization_loss
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(2, 8, 8, 8, 4), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 4, (2, 8, 8, 8)), jnp.int32)
    running = jnp.zeros((3,), jnp.float32)

    @jax.jit  # one program: eager per-op dispatch dominates on the CPU host
    def run(lg):
        loss, new_running = dynamic_task_prioritization_loss(lg, labels,
                                                             running)
        _, frozen = dynamic_task_prioritization_loss(lg, labels, running,
                                                     update_kpi=False)
        g = jax.grad(lambda l: dynamic_task_prioritization_loss(
            l, labels, running)[0])(lg)
        return loss, new_running, frozen, g

    loss, new_running, frozen, g = run(logits)
    assert np.isfinite(float(loss))
    # KPI moved toward the observed dice for present classes
    assert np.any(np.asarray(new_running) != 0)
    # update_kpi=False leaves the KPI untouched (only lowest DS level updates it)
    np.testing.assert_array_equal(np.asarray(frozen), np.asarray(running))
    # gradient flows
    assert np.all(np.isfinite(np.asarray(g)))


def test_pallas_conv3d_same_interpret_matches_lax():
    """Tap-GEMM Pallas conv (ops/pallas_conv.py) vs lax.conv, interpret mode."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from multitalent_tpu.ops.pallas_conv import pallas_conv3d_same
    rngl = np.random.RandomState(5)
    for shape, co in [((1, 8, 16, 16, 8), 8), ((2, 4, 8, 8, 8), 16)]:
        x = jnp.asarray(rngl.randn(*shape).astype(np.float32))
        w = jnp.asarray(rngl.randn(3, 3, 3, shape[-1], co).astype(np.float32))
        ref = lax.conv_general_dilated(
            x, w, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        got = pallas_conv3d_same(x, w, interpret=True)
        np.testing.assert_allclose(ref, got, atol=2e-4, rtol=1e-3)


def test_merged_conv_interpret_matches_dense_packed():
    """Merged-tap conv (ops/pallas_merged_conv.py): 12/18-GEMM schedule vs the
    dense packed conv, interpret mode, both factor schemes + decoder-style
    in_groups lane layouts."""
    import jax.numpy as jnp
    from multitalent_tpu.ops.packed_conv import packed_conv3d
    from multitalent_tpu.ops.pallas_merged_conv import (
        pallas_packed_conv3d_merged, prepare_merged)
    rngl = np.random.RandomState(7)
    for factors, cin, cout, in_groups in [
            ((2, 2), 30, 30, None), ((1, 2), 60, 60, None),
            ((2, 2), 30, 30, (20, 10)), ((1, 2), 60, 60, (40, 20))]:
        p = factors[0] * factors[1]
        x = jnp.asarray(rngl.randn(1, 8, 16, 16, p * cin).astype(np.float32))
        w = jnp.asarray(
            rngl.randn(3, 3, 3, cin, cout).astype(np.float32) * 0.1)
        ref = packed_conv3d(x, w, factors=factors, in_groups=in_groups)
        prep = prepare_merged(w, factors, in_groups)
        got = pallas_packed_conv3d_merged(x, prep, interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=2e-4, rtol=1e-3)


def test_merged_train_forward_and_grads_match_dense(monkeypatch):
    """conv3d_same_merged_train (the training forward through the merged-tap
    kernel): primal matches the dense packed conv in interpret mode, and its
    custom-vjp grads (dense-formulation backward) match jax.grad of the
    plain conv — values AND weight grads, including the decoder's
    group-concat lane layout."""
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.ops import pallas_merged_conv as pmc
    from multitalent_tpu.ops.packed_conv import pack_conv_weights
    from jax import lax

    monkeypatch.setattr(pmc, "_TRAIN_INTERPRET", True)
    rngl = np.random.RandomState(17)
    for cin, in_groups in [(30, None), (30, (20, 10))]:
        x = jnp.asarray(rngl.randn(1, 8, 16, 16, 4 * cin).astype(np.float32))
        w = jnp.asarray(
            rngl.randn(3, 3, 3, cin, 24).astype(np.float32) * 0.1)
        wp = pack_conv_weights(w, (2, 2), in_groups)

        def dense(xv, wv):
            pad = tuple((1, 1) for _ in range(3))
            return lax.conv_general_dilated(
                xv, wv, (1, 1, 1), pad,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        def merged(xv, wv):
            return pmc.conv3d_same_merged_train(xv, wv, (2, 2), cin,
                                                in_groups)

        out = merged(x, wp)
        ref = dense(x, wp)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=1e-3)
        g = jnp.asarray(rngl.randn(*ref.shape).astype(np.float32))
        dx_r, dw_r = jax.vjp(dense, x, wp)[1](g)
        dx_m, dw_m = jax.vjp(merged, x, wp)[1](g)
        np.testing.assert_allclose(np.asarray(dx_m), np.asarray(dx_r),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(dw_m), np.asarray(dw_r),
                                   atol=2e-3, rtol=1e-3)


def test_merged_bwd_grads_match_dense_through_pack(monkeypatch):
    """Merged-tap BACKWARD (MTTPU_MERGED_BWD=1: dx via the merged kernel on
    reversed-transposed packed taps, wgrad via the merged operands): grads of
    the full train chain x, w -> merged_conv(x, pack_conv_weights(w)) match
    jax.grad of the dense conv. The comparison goes THROUGH
    pack_conv_weights: the merged wgrad broadcasts each group's grad to its
    member taps, which agrees with the dense wgrad only at in-block entries
    — exactly the ones pack_conv_weights' VJP reads."""
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.ops import pallas_merged_conv as pmc
    from multitalent_tpu.ops.packed_conv import pack_conv_weights
    from jax import lax

    monkeypatch.setattr(pmc, "_TRAIN_INTERPRET", True)
    monkeypatch.setenv("MTTPU_MERGED_BWD", "1")
    rngl = np.random.RandomState(23)
    for cin, in_groups in [(30, None), (30, (20, 10))]:
        x = jnp.asarray(rngl.randn(1, 8, 16, 16, 4 * cin).astype(np.float32))
        w = jnp.asarray(
            rngl.randn(3, 3, 3, cin, 24).astype(np.float32) * 0.1)
        g = jnp.asarray(
            rngl.randn(1, 8, 16, 16, 4 * 24).astype(np.float32))

        def dense(xv, wv):
            pad = tuple((1, 1) for _ in range(3))
            return lax.conv_general_dilated(
                xv, pack_conv_weights(wv, (2, 2), in_groups), (1, 1, 1),
                pad, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        def merged(xv, wv):
            return pmc.conv3d_same_merged_train(
                xv, pack_conv_weights(wv, (2, 2), in_groups), (2, 2), cin,
                in_groups)

        np.testing.assert_allclose(np.asarray(merged(x, w)),
                                   np.asarray(dense(x, w)),
                                   atol=2e-4, rtol=1e-3)
        dx_r, dw_r = jax.vjp(dense, x, w)[1](g)
        dx_m, dw_m = jax.vjp(merged, x, w)[1](g)
        np.testing.assert_allclose(np.asarray(dx_m), np.asarray(dx_r),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(dw_m), np.asarray(dw_r),
                                   atol=2e-3, rtol=1e-3)


def test_merged2_conv_interpret_matches_grouped_dense():
    """Two-input merged-tap conv (decoder concat conv without the concat) vs
    the dense grouped packed conv, interpret mode, equal and unequal group
    widths."""
    import jax.numpy as jnp
    from multitalent_tpu.ops.packed_conv import packed_conv3d
    from multitalent_tpu.ops.pallas_merged_conv import (
        pallas_packed_conv3d_merged2, prepare_merged2)
    rngl = np.random.RandomState(8)
    for g0, g1, cout in [(30, 30, 30), (20, 10, 16)]:
        a = jnp.asarray(rngl.randn(1, 8, 16, 16, 4 * g0).astype(np.float32))
        b = jnp.asarray(rngl.randn(1, 8, 16, 16, 4 * g1).astype(np.float32))
        w = jnp.asarray(
            rngl.randn(3, 3, 3, g0 + g1, cout).astype(np.float32) * 0.1)
        ref = packed_conv3d(jnp.concatenate([a, b], axis=-1), w,
                            factors=(2, 2), in_groups=(g0, g1))
        prep = prepare_merged2(w, (2, 2), (g0, g1))
        got = pallas_packed_conv3d_merged2(a, b, prep, interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=2e-4, rtol=1e-3)


def test_conv3d_same_fast_grads_use_xla_backward():
    """custom_vjp wrapper: grads equal the plain lax.conv grads (CPU falls back
    to the XLA forward too, so this checks the vjp plumbing end to end)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from multitalent_tpu.ops.pallas_conv import conv3d_same_fast
    rngl = np.random.RandomState(6)
    x = jnp.asarray(rngl.randn(1, 4, 8, 8, 8).astype(np.float32))
    w = jnp.asarray(rngl.randn(3, 3, 3, 8, 8).astype(np.float32))
    tgt = jnp.asarray(rngl.randn(1, 4, 8, 8, 8).astype(np.float32))

    def ref_loss(x, w):
        out = lax.conv_general_dilated(
            x, w, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.mean((out - tgt) ** 2)

    def fast_loss(x, w):
        return jnp.mean((conv3d_same_fast(x, w) - tgt) ** 2)

    gx_r, gw_r = jax.grad(ref_loss, argnums=(0, 1))(x, w)
    gx_f, gw_f = jax.grad(fast_loss, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx_r, gx_f, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(gw_r, gw_f, atol=1e-5, rtol=1e-4)


def test_pallas_seghead_d2s_interpret_matches_reference():
    """Fused seg-head (pointwise conv + depth-to-space) vs the two-op packed
    reference path, interpret mode, both packing factor layouts."""
    import jax.numpy as jnp
    from multitalent_tpu.ops.pallas_seghead import seghead_d2s
    from multitalent_tpu.ops.packed_conv import (depth_to_space_yx, nphases,
                                                 packed_pointwise_conv3d)
    rngl = np.random.RandomState(12)
    for factors, shape, c, k in [((2, 2), (1, 8, 16, 16), 12, 5),
                                 ((1, 2), (2, 4, 12, 8), 24, 47)]:
        p = nphases(factors)
        x = jnp.asarray(rngl.randn(*shape, p * c).astype(np.float32))
        w = jnp.asarray(rngl.randn(1, 1, 1, c, k).astype(np.float32))
        b = jnp.asarray(rngl.randn(k).astype(np.float32))
        ref = depth_to_space_yx(
            packed_pointwise_conv3d(x, w, jnp.tile(b, p), factors=factors),
            factors)
        got = seghead_d2s(x, w, b, factors=factors, interpret=True)
        assert got.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=2e-4, rtol=1e-3)
        nob = seghead_d2s(x, w, None, factors=factors, interpret=True)
        ref_nob = depth_to_space_yx(
            packed_pointwise_conv3d(x, w, None, factors=factors), factors)
        np.testing.assert_allclose(np.asarray(ref_nob), np.asarray(nob),
                                   atol=2e-4, rtol=1e-3)


@pytest.mark.slow  # opt-in kernel (not the production path)
def test_pallas_conv_affine_prologue_and_stats_interpret(monkeypatch):
    """Fused normalize-prologue conv: conv(lrelu(x*s+t), w) + bias with
    SAME-zero-pad applied to the NORMALIZED tensor, plus per-sample channel
    sum/sumsq of the output."""
    # the production MIN_CIN routing gate (32, tuned on v5e) would reject the
    # small interpret-mode channel counts; this test checks kernel MATH
    monkeypatch.setenv("MTTPU_PALLAS_MIN_CIN", "1")
    import jax.numpy as jnp
    from jax import lax
    from multitalent_tpu.ops.pallas_conv import pallas_conv3d_same_affine
    rngl = np.random.RandomState(13)
    for shape, co in [((2, 4, 8, 16, 5), 7), ((1, 8, 16, 16, 8), 8)]:
        c = shape[-1]
        x = jnp.asarray(rngl.randn(*shape).astype(np.float32))
        w = jnp.asarray(rngl.randn(3, 3, 3, c, co).astype(np.float32))
        b = jnp.asarray(rngl.randn(co).astype(np.float32))
        s = jnp.asarray((rngl.rand(shape[0], c) + 0.5).astype(np.float32))
        t = jnp.asarray(rngl.randn(shape[0], c).astype(np.float32))
        yn = x * s[:, None, None, None, :] + t[:, None, None, None, :]
        yn = jnp.where(yn >= 0, yn, yn * 1e-2)
        ref = lax.conv_general_dilated(
            yn, w, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
        out, stats = pallas_conv3d_same_affine(
            x, w, bias=b, in_scale=s, in_shift=t, interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   atol=3e-4, rtol=1e-3)
        rs = np.asarray(ref, np.float64)
        np.testing.assert_allclose(np.asarray(stats)[:, 0],
                                   rs.sum(axis=(1, 2, 3)), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(stats)[:, 1],
                                   (rs ** 2).sum(axis=(1, 2, 3)), rtol=1e-4)
        # no-affine mode: plain conv + bias, stats still produced
        ref2 = lax.conv_general_dilated(
            x, w, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
        out2, stats2 = pallas_conv3d_same_affine(x, w, bias=b, interpret=True)
        np.testing.assert_allclose(np.asarray(ref2), np.asarray(out2),
                                   atol=3e-4, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(stats2)[:, 0],
            np.asarray(ref2, np.float64).sum(axis=(1, 2, 3)), rtol=1e-4)
        # with_stats=False: single output, epilogue skipped (caller reduces
        # in XLA — the MTTPU_FUSED_STATS=xla schedule)
        out3 = pallas_conv3d_same_affine(x, w, bias=b, in_scale=s, in_shift=t,
                                         interpret=True, with_stats=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out3),
                                   atol=0, rtol=0)


@pytest.mark.slow  # opt-in kernel (not the production path)
def test_fused_inference_forward_matches_packed_forward():
    """packed_unet_forward_fused (conv+norm+lrelu fused in the Pallas kernels,
    interpret mode) vs the unfused packed forward on a small packable UNet."""
    import jax.numpy as jnp
    from multitalent_tpu.models.generic_unet import GenericUNet
    from multitalent_tpu.ops.packed_unet import (packed_unet_forward,
                                                 packed_unet_forward_fused)
    model = GenericUNet(input_channels=1, base_num_features=8, num_classes=5,
                        pool_op_kernel_sizes=((2, 2, 2), (1, 2, 2)),
                        conv_kernel_sizes=((3, 3, 3),) * 3,
                        deep_supervision=False, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(14).randn(2, 8, 32, 32, 1),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = packed_unet_forward(model, params, x, deep_supervision=False,
                              pack_max_channels=64)
    got = packed_unet_forward_fused(model, params, x, pack_max_channels=64,
                                    interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3,
                               rtol=1e-2)


@pytest.mark.slow  # opt-in kernel (not the production path)
def test_fused_packed_output_matches_unfused(monkeypatch):
    """Fused forward with packed_output=True (the sliding-window engine path)
    vs the unfused packed_output forward, under both stats schedules."""
    import jax.numpy as jnp
    from multitalent_tpu.models.generic_unet import GenericUNet
    from multitalent_tpu.ops.packed_unet import (packed_unet_forward,
                                                 packed_unet_forward_fused)
    model = GenericUNet(input_channels=1, base_num_features=8, num_classes=5,
                        pool_op_kernel_sizes=((2, 2, 2), (2, 2, 2)),
                        conv_kernel_sizes=((3, 3, 3),) * 3,
                        deep_supervision=False, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(21).randn(2, 8, 16, 16, 1),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref, f1 = packed_unet_forward(model, params, x, packed_output=True,
                                  pack_max_channels=64)
    for stats in ("kernel", "xla"):
        monkeypatch.setenv("MTTPU_FUSED_STATS", stats)
        got, f2 = packed_unet_forward_fused(model, params, x,
                                            pack_max_channels=64,
                                            packed_output=True, interpret=True)
        assert f1 == f2 and got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-3)


@pytest.mark.slow  # opt-in kernel (not the production path)
def test_fused_train_forward_values_and_grads_match_packed():
    """Differentiable fused forward (deep supervision) vs the unfused packed
    forward: values AND parameter gradients of a DS loss must agree."""
    import jax.numpy as jnp
    from multitalent_tpu.models.generic_unet import GenericUNet
    from multitalent_tpu.ops.packed_unet import (packed_unet_forward,
                                                 packed_unet_forward_fused)
    model = GenericUNet(input_channels=1, base_num_features=8, num_classes=3,
                        pool_op_kernel_sizes=((2, 2, 2), (1, 2, 2)),
                        conv_kernel_sizes=((3, 3, 3),) * 3,
                        deep_supervision=True, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(18).randn(2, 8, 32, 32, 1),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    tgt = [jnp.asarray(np.random.RandomState(19).randn(2, 8 // max(1, 2 ** i),
                                                       32 // 2 ** i,
                                                       32 // 2 ** i, 3),
                       jnp.float32) for i in range(2)]

    def loss(fwd):
        def run(p):
            outs = fwd(p)
            return sum(jnp.mean((o - t) ** 2)
                       for o, t in zip(outs[:2], tgt))
        return run

    ref_fn = loss(lambda p: packed_unet_forward(
        model, p, x, deep_supervision=True, pack_max_channels=64))
    fus_fn = loss(lambda p: packed_unet_forward_fused(
        model, p, x, pack_max_channels=64, deep_supervision=True,
        differentiable=True))
    vr, gr = jax.value_and_grad(ref_fn)(params)
    vf, gf = jax.value_and_grad(fus_fn)(params)
    np.testing.assert_allclose(float(vr), float(vf), rtol=1e-3)
    flat_r = jax.tree_util.tree_leaves_with_path(gr)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, leaf in flat_r:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_f[path]), atol=5e-3, rtol=5e-2,
            err_msg=jax.tree_util.keystr(path))


def test_conv_affine_fast_custom_vjp_matches_autodiff():
    """conv3d_same_affine_fast's hand backward (incl. gradient flow through
    the stats outputs) vs jax autodiff of the reference composition."""
    import jax.numpy as jnp
    from jax import lax
    from multitalent_tpu.ops.pallas_conv import (conv3d_same_affine_fast,
                                                 _ref_conv_affine)
    rngl = np.random.RandomState(17)
    n, c, co = 2, 5, 7
    x = jnp.asarray(rngl.randn(n, 4, 8, 8, c).astype(np.float32))
    w = jnp.asarray(rngl.randn(3, 3, 3, c, co).astype(np.float32) * 0.3)
    b = jnp.asarray(rngl.randn(co).astype(np.float32))
    s = jnp.asarray((rngl.rand(n, c) + 0.5).astype(np.float32))
    t = jnp.asarray(rngl.randn(n, c).astype(np.float32))
    go = jnp.asarray(rngl.randn(n, 4, 8, 8, co).astype(np.float32))
    gs = jnp.asarray(rngl.randn(n, 2, co).astype(np.float32) * 0.01)

    def scalarize(fn):
        def run(x, w, b, s, t):
            out, stats = fn(x, w, b, s, t)
            return jnp.sum(out * go) + jnp.sum(stats * gs)
        return run

    ref = scalarize(lambda *a: _ref_conv_affine(*a, 1e-2))
    fast = scalarize(lambda *a: conv3d_same_affine_fast(*a, 1e-2))
    val_r = float(ref(x, w, b, s, t))
    val_f = float(fast(x, w, b, s, t))
    np.testing.assert_allclose(val_r, val_f, rtol=1e-5)
    gr = jax.grad(ref, argnums=(0, 1, 2, 3, 4))(x, w, b, s, t)
    gf = jax.grad(fast, argnums=(0, 1, 2, 3, 4))(x, w, b, s, t)
    for a, bb, name in zip(gr, gf, "xwbst"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-3,
                                   rtol=1e-3, err_msg=f"grad {name}")
    # no-affine mode (plain conv + bias + stats)
    ref2 = scalarize(lambda x_, w_, b_, s_, t_: _ref_conv_affine(
        x_, w_, b_, None, None, 1e-2))
    fast2 = scalarize(lambda x_, w_, b_, s_, t_: conv3d_same_affine_fast(
        x_, w_, b_, None, None, 1e-2))
    gr2 = jax.grad(ref2, argnums=(0, 1, 2))(x, w, b, s, t)
    gf2 = jax.grad(fast2, argnums=(0, 1, 2))(x, w, b, s, t)
    for a, bb, name in zip(gr2, gf2, "xwb"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-3,
                                   rtol=1e-3, err_msg=f"noaffine grad {name}")


def test_pallas_wgrad_interpret_matches_vjp():
    """dw kernel (pallas_conv3d_same_wgrad) vs the XLA conv vjp, interpret
    mode, incl. a multi-block grid and Cin != Cout."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from multitalent_tpu.ops.pallas_conv import pallas_conv3d_same_wgrad

    def conv(xv, wv):
        return lax.conv_general_dilated(
            xv, wv, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    rngl = np.random.RandomState(11)
    for shape, co in [((2, 4, 8, 16, 5), 7), ((1, 16, 32, 32, 3), 4)]:
        x = jnp.asarray(rngl.randn(*shape).astype(np.float32))
        g = jnp.asarray(rngl.randn(*shape[:-1], co).astype(np.float32))
        w = jnp.asarray(rngl.randn(3, 3, 3, shape[-1], co).astype(np.float32))
        _, vjp = jax.vjp(lambda wv: conv(x, wv), w)
        (dw_ref,) = vjp(g)
        dw = pallas_conv3d_same_wgrad(x, g, interpret=True)
        np.testing.assert_allclose(dw_ref, dw, atol=2e-4, rtol=1e-3)


