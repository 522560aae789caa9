"""FabiansUNet (residual encoder) tests: shapes, DS output count, zero-init of the
last norm in each residual block, plans-driven construction."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multitalent_tpu.models.residual_unet import (BasicResidualBlock,
                                                  ResidualEncoderUNet,
                                                  build_resenc_unet_from_plans)


def _make(num_classes=3):
    return ResidualEncoderUNet(
        input_channels=1, base_num_features=4, num_classes=num_classes,
        pool_op_kernel_sizes=((1, 1, 1), (1, 2, 2), (2, 2, 2)),
        conv_kernel_sizes=((1, 3, 3), (3, 3, 3), (3, 3, 3)),
        num_blocks_encoder=(1, 2, 3), num_blocks_decoder=(1, 1),
        dtype=jnp.float32)


def test_resenc_ds_shapes_and_grads():
    """DS output shapes, no-DS == full-res head, finite nonzero grads — one
    jitted program (two separate tests each paid the same XLA:CPU compile)."""
    net = _make()
    x = jnp.ones((1, 4, 8, 8, 1))
    params = net.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd_and_grad(p):
        outs = net.apply(p, x)
        single = net.apply(p, x, deep_supervision=False)
        g = jax.grad(
            lambda q: sum(jnp.mean(o ** 2) for o in net.apply(q, x)))(p)
        return outs, single, g

    outs, single, g = fwd_and_grad(params)
    # 3 stages -> 2 decoder stages -> 2 DS outputs, highest resolution first
    assert len(outs) == 2
    assert outs[0].shape == (1, 4, 8, 8, 3)
    assert outs[1].shape == (1, 4, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(outs[0]))
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(l)) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_residual_block_zero_init_is_projected_identity():
    """With norm2.scale == 0 the residual path contributes nothing at init: the
    block must reduce to lrelu(skip-projection(x))."""
    blk = BasicResidualBlock(features=4, kernel_size=(3, 3, 3), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4, 4))
    params = blk.init(jax.random.PRNGKey(1), x)
    assert np.all(np.asarray(params["params"]["norm2"]["scale"]) == 0)
    y = blk.apply(params, x)
    # cin == features and stride 1 -> identity skip; residual path is only bias
    # terms after the zeroed scale, so y ~= lrelu(x + norm2.bias)
    expected = jax.nn.leaky_relu(
        x + np.asarray(params["params"]["norm2"]["bias"]), 0.01)
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected), atol=1e-5)


def test_build_from_resenc_plans():
    from multitalent_tpu.plans import Plans
    plans = Plans.from_dict({
        "num_stages": 1, "num_modalities": 1, "modalities": {0: "CT"},
        "normalization_schemes": {0: "CT"}, "num_classes": 2, "all_classes": [1, 2],
        "base_num_features": 4, "use_mask_for_norm": {0: False},
        "transpose_forward": [0, 1, 2], "transpose_backward": [0, 1, 2],
        "data_identifier": "x",
        "plans_per_stage": {0: {
            "batch_size": 2, "patch_size": (4, 8, 8),
            "current_spacing": (1., 1., 1.), "original_spacing": (1., 1., 1.),
            "median_patient_size_in_voxels": (16, 16, 16),
            "num_pool_per_axis": [1, 2, 2],
            "pool_op_kernel_sizes": [[1, 1, 1], [1, 2, 2], [2, 2, 2]],
            "conv_kernel_sizes": [[1, 3, 3], [3, 3, 3], [3, 3, 3]],
            "num_blocks_encoder": (1, 2, 3), "num_blocks_decoder": (1, 1),
        }},
    })
    net = build_resenc_unet_from_plans(plans, 0, dtype=jnp.float32)
    x = jnp.zeros((1, 4, 8, 8, 1))
    outs = net.apply(net.init(jax.random.PRNGKey(0), x), x)
    assert len(outs) == 2 and outs[0].shape[-1] == 3  # 2 classes + bg


def _mednext_net_and_input():
    from multitalent_tpu.models.mednext import MedNeXt
    net = MedNeXt(in_channels=1, n_channels=4, n_classes=3,
                  exp_r=(2,) * 9, block_counts=(1,) * 9, remat=False,
                  dtype=jnp.float32)
    return net, jnp.zeros((1, 16, 16, 16, 1))


def test_mednext_forward_shapes():
    """MedNeXt backbone: 5 DS outputs at dyadic scales; no-DS output equals
    the full-resolution head (grads split into a slow test: the backward
    graph of the deep ConvNeXt stack triples the XLA:CPU compile)."""
    net, x = _mednext_net_and_input()
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd(p):
        return net.apply(p, x), net.apply(p, x, deep_supervision=False)

    outs, single = fwd(params)
    assert len(outs) == 5
    assert outs[0].shape == (1, 16, 16, 16, 3)
    assert outs[4].shape == (1, 1, 1, 1, 3)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(outs[0]))


@pytest.mark.slow
def test_mednext_grads_finite():
    net, x = _mednext_net_and_input()
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    g = jax.jit(jax.grad(
        lambda q: sum(jnp.mean(o ** 2) for o in net.apply(q, x))))(params)
    assert all(np.isfinite(l).all() for l in jax.tree.leaves(g))


def _swin_net_and_input():
    from multitalent_tpu.models.swin_unetr import SwinUNETR
    net = SwinUNETR(in_channels=1, out_channels=3, feature_size=6,
                    depths=(1, 1, 1, 1), num_heads=(1, 2, 3, 6), window_size=2,
                    dtype=jnp.float32)
    return net, jnp.zeros((1, 32, 32, 32, 1))


def test_swin_unetr_forward_shapes():
    """SwinUNETR: shifted-window attention encoder + UNETR decoder.
    init+apply fused in one jitted program: two programs = two full
    XLA:CPU compiles of the attention stack."""
    net, x = _swin_net_and_input()
    out = jax.jit(lambda k: net.apply(net.init(k, x), x))(
        jax.random.PRNGKey(0))
    assert out.shape == (1, 32, 32, 32, 3)


@pytest.mark.slow
def test_swin_unetr_grads_finite():
    net, x = _swin_net_and_input()
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    g = jax.jit(jax.grad(lambda q: jnp.mean(net.apply(q, x) ** 2)))(params)
    assert all(np.isfinite(l).all() for l in jax.tree.leaves(g))
