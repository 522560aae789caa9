import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multitalent_tpu.models.generic_unet import GenericUNet, compute_stage_features

POOLS = ((2, 2, 2), (2, 2, 2), (1, 2, 2))
KERNELS = ((3, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3))


def _make(num_classes=3, base=8, deep_supervision=True):
    return GenericUNet(
        input_channels=1, base_num_features=base, num_classes=num_classes,
        pool_op_kernel_sizes=POOLS, conv_kernel_sizes=KERNELS,
        max_num_features=320, deep_supervision=deep_supervision, dtype=jnp.float32)


def test_forward_shapes_deep_supervision():
    net = _make()
    x = jnp.zeros((2, 8, 16, 16, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(params, x)
    assert isinstance(outs, list) and len(outs) == 3
    assert outs[0].shape == (2, 8, 16, 16, 3)
    assert outs[1].shape == (2, 8 // 1, 8, 8, 3)[0:1] + (4, 8, 8, 3)  # pool (1,2,2) is last decoder up
    # resolution halves per DS level following pool kernels from the top
    assert outs[1].shape == (2, 4, 8, 8, 3)
    assert outs[2].shape == (2, 2, 4, 4, 3)
    assert outs[0].dtype == jnp.float32


def test_forward_no_ds():
    net = _make(deep_supervision=False)
    x = jnp.zeros((1, 8, 16, 16, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (1, 8, 16, 16, 3)


def test_stage_features_cap():
    assert compute_stage_features(30, 6, 320) == [30, 60, 120, 240, 320, 320]
    assert compute_stage_features(32, 6, 320) == [32, 64, 128, 256, 320, 320]


def _conv_params(cin, cout, k, bias=True):
    return cin * cout * int(np.prod(k)) + (cout if bias else 0)


def test_param_count_matches_reference_formula():
    """Analytic parameter count of the reference Generic_UNet wiring
    (conv_per_stage=2, conv pooling+upsampling, affine InstanceNorm, bias convs,
    bias-free transpconv and seg heads)."""
    base, num_classes, cin = 8, 3, 1
    feats = compute_stage_features(base, 4, 320)
    expected = 0
    # encoder stages 0..2 + bottleneck: 2 convs each + 2 norm params per channel
    prev = cin
    for d in range(4):
        f = feats[d]
        expected += _conv_params(prev, f, (3, 3, 3)) + 2 * f
        expected += _conv_params(f, f, (3, 3, 3)) + 2 * f
        prev = f
    # decoder u=0..2: transpconv(prev->fs, kernel=pool, no bias) + 2 convs + seg head
    for u in range(3):
        fs = feats[2 - u]
        pool = POOLS[2 - u]
        expected += prev * fs * int(np.prod(pool))
        expected += _conv_params(2 * fs, fs, (3, 3, 3)) + 2 * fs
        expected += _conv_params(fs, fs, (3, 3, 3)) + 2 * fs
        expected += _conv_params(fs, num_classes, (1, 1, 1), bias=False)
        prev = fs

    net = _make(num_classes=num_classes, base=base)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 1)))
    actual = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert actual == expected


def test_gradients_flow_and_jit():
    net = _make(base=4)
    x = jnp.ones((1, 8, 16, 16, 1))
    params = net.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def loss_fn(p):
        outs = net.apply(p, x)
        return sum(jnp.mean(o ** 2) for o in outs)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(l)) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_instance_norm_normalizes_per_sample():
    from multitalent_tpu.models.blocks import InstanceNorm

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 6, 7, 3)) * 10 + 5
    mod = InstanceNorm()
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)
    m = np.mean(np.asarray(y), axis=(1, 2, 3))
    s = np.std(np.asarray(y), axis=(1, 2, 3))
    np.testing.assert_allclose(m, 0, atol=1e-4)
    np.testing.assert_allclose(s, 1, atol=1e-3)
