"""Numeric validation of the torch->flax weight converter: a freshly-built torch
network with the reference's layer semantics (Conv3d + affine InstanceNorm3d +
LeakyReLU(0.01), strided-conv pooling, ConvTranspose3d upsampling, concat, 1x1
bias-free seg head) must produce the same output as our flax GenericUNet after
conversion."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# numeric-equivalence test: keep fp32 convs in fp32 on TPU (default lowers to bf16)
jax.config.update("jax_default_matmul_precision", "highest")

from multitalent_tpu.io.torch_convert import (convert_generic_unet_state_dict,
                                              strip_module_prefix)
from multitalent_tpu.models.generic_unet import GenericUNet


class TBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv = tnn.Conv3d(cin, cout, 3, stride, 1)
        self.instnorm = tnn.InstanceNorm3d(cout, affine=True)
        self.lrelu = tnn.LeakyReLU(0.01)

    def forward(self, x):
        return self.lrelu(self.instnorm(self.conv(x)))


class TStacked(tnn.Module):
    def __init__(self, cin, cout, n, first_stride=1):
        super().__init__()
        self.blocks = tnn.ModuleList(
            [TBlock(cin if i == 0 else cout, cout,
                    first_stride if i == 0 else 1) for i in range(n)])

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        return x


class TorchMiniUNet(tnn.Module):
    """1-pool, 2-convs-per-stage torch net with reference Generic_UNet key names."""

    def __init__(self, cin=2, base=4, num_classes=3, pool=(2, 2, 2)):
        super().__init__()
        self.conv_blocks_context = tnn.ModuleList([
            TStacked(cin, base, 2),
            tnn.Sequential(TStacked(base, base * 2, 1, first_stride=pool),
                           TStacked(base * 2, base * 2, 1)),
        ])
        self.tu = tnn.ModuleList(
            [tnn.ConvTranspose3d(base * 2, base, pool, pool, bias=False)])
        self.conv_blocks_localization = tnn.ModuleList([
            tnn.Sequential(TStacked(base * 2, base, 1), TStacked(base, base, 1)),
        ])
        self.seg_outputs = tnn.ModuleList(
            [tnn.Conv3d(base, num_classes, 1, bias=False)])

    def forward(self, x):
        skip = self.conv_blocks_context[0](x)
        x = self.conv_blocks_context[1](skip)
        x = self.tu[0](x)
        x = torch.cat((x, skip), dim=1)
        x = self.conv_blocks_localization[0](x)
        return self.seg_outputs[0](x)


def test_torch_to_flax_numeric_equivalence():
    torch.manual_seed(0)
    tnet = TorchMiniUNet()
    # randomize norm affine params away from the trivial (1, 0) init
    with torch.no_grad():
        for name, p in tnet.named_parameters():
            if "instnorm" in name:
                p.add_(torch.randn_like(p) * 0.3)
    tnet.eval()

    x = np.random.RandomState(0).randn(1, 2, 8, 8, 8).astype(np.float32)
    with torch.no_grad():
        out_t = tnet(torch.from_numpy(x)).numpy()

    params = convert_generic_unet_state_dict(tnet.state_dict(), num_pool=1,
                                             conv_per_stage=2)
    jnet = GenericUNet(input_channels=2, base_num_features=4, num_classes=3,
                       pool_op_kernel_sizes=((2, 2, 2),),
                       conv_kernel_sizes=((3, 3, 3), (3, 3, 3)),
                       deep_supervision=False, dtype=jnp.float32)
    x_j = jnp.moveaxis(jnp.asarray(x), 1, -1)
    out_j = jnet.apply({"params": params}, x_j)
    out_j = np.moveaxis(np.asarray(out_j), -1, 1)

    assert out_t.shape == out_j.shape
    np.testing.assert_allclose(out_j, out_t, atol=1e-3, rtol=1e-3)


def test_module_prefix_strip():
    sd = {"module.a.weight": 1, "b.bias": 2}
    out = strip_module_prefix(sd)
    assert set(out) == {"a.weight", "b.bias"}
