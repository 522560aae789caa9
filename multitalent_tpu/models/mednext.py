"""MedNeXt: ConvNeXt-style 3D segmentation backbone, TPU-native.

Parity target: nnunet/network_architecture/mednextv1/MedNextV1.py:7-330 and
blocks.py (MedNeXtBlock = depthwise k^3 conv -> per-channel GroupNorm -> 1x1
expansion -> GELU -> 1x1 compression with residual; Down/Up blocks are the same
with stride-2 depthwise (transposed) convs and 1x1 resampling residuals; stem is
a 1x1 conv; decoder merges skips by ADDITION; five 1x1 OutBlocks provide deep
supervision), as configured by the MultiTalent trainer
(MultiTalent_meets_mednext.py:91-104: n_channels 32, kernel 3,
exp_r=[3,4,8,8,8,8,8,4,3], block_counts=[3,4,8,8,8,8,8,4,3]).

TPU-native notes: channels-last, bf16 compute/fp32 params; depthwise convs via
feature_group_count; the transposed depthwise up-convolution is
lax.conv_general_dilated with lhs_dilation (+ the reference's asymmetric
leading pad); torch's gradient checkpointing maps to jax.checkpoint on each
stage (rematerialization under jit).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from multitalent_tpu.models.blocks import InstanceNorm
from multitalent_tpu.registry import NETWORKS


class _DepthwiseConvTranspose(nn.Module):
    """Stride-2 transposed depthwise conv (k=kernel, pad=k//2) with the
    reference's extra (1,0) leading pad so output = 2 x input exactly."""

    kernel_size: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, k, 1, c), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        # (in-1)*2 + 1 dilated input, 'same-ish' padding -> 2*in - 1 outputs
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1, 1), padding=[(k // 2, k // 2)] * 3,
            lhs_dilation=(2, 2, 2), feature_group_count=c,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        y = y + bias.astype(y.dtype)
        return jnp.pad(y, ((0, 0), (1, 0), (1, 0), (1, 0), (0, 0)))


class _PointwiseUpsample(nn.Module):
    """1x1 stride-2 transposed conv residual path of the up block (+ leading pad)."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, 1, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1, 1), padding=[(0, 0)] * 3,
            lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        y = y + bias.astype(y.dtype)
        return jnp.pad(y, ((0, 0), (1, 0), (1, 0), (1, 0), (0, 0)))


class MedNeXtBlock(nn.Module):
    features: int            # output channels
    exp_r: int = 4
    kernel_size: int = 3
    do_res: bool = True
    mode: str = "plain"      # plain | down | up
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel_size
        if self.mode == "down":
            x1 = nn.Conv(cin, (k,) * 3, strides=(2, 2, 2),
                         padding=[(k // 2, k // 2)] * 3, feature_group_count=cin,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="dwconv")(x)
        elif self.mode == "up":
            x1 = _DepthwiseConvTranspose(k, self.dtype, name="dwconv")(x)
        else:
            x1 = nn.Conv(cin, (k,) * 3, padding=[(k // 2, k // 2)] * 3,
                         feature_group_count=cin, dtype=self.dtype,
                         param_dtype=jnp.float32, name="dwconv")(x)
        # per-channel GroupNorm(groups=C) == InstanceNorm
        x1 = InstanceNorm(name="norm")(x1)
        x1 = nn.Conv(self.exp_r * cin, (1, 1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32, name="expand")(x1)
        x1 = nn.gelu(x1)
        x1 = nn.Conv(self.features, (1, 1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32, name="compress")(x1)
        if self.do_res:
            if self.mode == "down":
                res = nn.Conv(self.features, (1, 1, 1), strides=(2, 2, 2),
                              dtype=self.dtype, param_dtype=jnp.float32,
                              name="res_conv")(x)
            elif self.mode == "up":
                res = _PointwiseUpsample(self.features, self.dtype,
                                         name="res_conv")(x)
            else:
                res = x
            x1 = x1 + res.astype(x1.dtype)
        return x1


class _Stage(nn.Module):
    features: int
    num_blocks: int
    exp_r: int
    kernel_size: int
    do_res: bool
    remat: bool
    dtype: Any

    @nn.compact
    def __call__(self, x):
        block = MedNeXtBlock
        if self.remat:
            block = nn.remat(MedNeXtBlock)
        for i in range(self.num_blocks):
            x = block(self.features, self.exp_r, self.kernel_size,
                      do_res=self.do_res, mode="plain", dtype=self.dtype,
                      name=f"block{i}")(x)
        return x


@NETWORKS.register(aliases=("MedNeXt",))
class MedNeXt(nn.Module):
    """5-level MedNeXt with additive skips and deep supervision; outputs highest
    resolution first."""

    in_channels: int = 1
    n_channels: int = 32
    n_classes: int = 2
    exp_r: Sequence[int] = (3, 4, 8, 8, 8, 8, 8, 4, 3)
    block_counts: Sequence[int] = (3, 4, 8, 8, 8, 8, 8, 4, 3)
    kernel_size: int = 3
    do_res: bool = True
    do_res_up_down: bool = True
    deep_supervision: bool = True
    remat: bool = True
    dtype: Any = jnp.bfloat16

    @property
    def input_shape_must_be_divisible_by(self) -> int:
        return 2 ** 4

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 deep_supervision: bool | None = None):
        ds = self.deep_supervision if deep_supervision is None else deep_supervision
        n = self.n_channels
        exp = list(self.exp_r)
        bc = list(self.block_counts)
        x = x.astype(self.dtype)
        x = nn.Conv(n, (1, 1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem")(x)

        skips = []
        for lvl in range(4):
            x = _Stage(n * 2 ** lvl, bc[lvl], exp[lvl], self.kernel_size,
                       self.do_res, self.remat, self.dtype,
                       name=f"enc{lvl}")(x)
            skips.append(x)
            x = MedNeXtBlock(n * 2 ** (lvl + 1), exp[lvl], self.kernel_size,
                             do_res=self.do_res_up_down, mode="down",
                             dtype=self.dtype, name=f"down{lvl}")(x)

        x = _Stage(n * 16, bc[4], exp[4], self.kernel_size, self.do_res,
                   self.remat, self.dtype, name="bottleneck")(x)

        outs = []
        if ds:
            outs.append(nn.Conv(self.n_classes, (1, 1, 1), dtype=self.dtype,
                                param_dtype=jnp.float32, name="out4")(x)
                        .astype(jnp.float32))
        for i, lvl in enumerate(range(3, -1, -1)):
            x = MedNeXtBlock(n * 2 ** lvl, exp[5 + i], self.kernel_size,
                             do_res=self.do_res_up_down, mode="up",
                             dtype=self.dtype, name=f"up{lvl}")(x)
            x = x + skips[lvl].astype(x.dtype)
            x = _Stage(n * 2 ** lvl, bc[5 + i], exp[5 + i], self.kernel_size,
                       self.do_res, self.remat, self.dtype,
                       name=f"dec{lvl}")(x)
            if lvl > 0 and ds:
                outs.append(nn.Conv(self.n_classes, (1, 1, 1), dtype=self.dtype,
                                    param_dtype=jnp.float32,
                                    name=f"out{lvl}")(x).astype(jnp.float32))
        final = nn.Conv(self.n_classes, (1, 1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="out0")(x).astype(jnp.float32)
        if ds:
            return [final] + outs[::-1]
        return final
