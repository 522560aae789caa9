"""FabiansUNet: residual encoder + plain-conv decoder, TPU-native.

Parity target: nnunet/network_architecture/generic_modular_residual_UNet.py
(`BasicResidualBlock` conv_blocks.py:116-230, `ResidualUNetEncoder`:28-140,
`FabiansUNet`:320-373 with PlainConvUNetDecoder) as instantiated by the resenc
MultiTalent trainer (MultiTalent_meets_resenc.py:72-104): InstanceNorm+LeakyReLU,
plans-driven per-stage block counts (`num_blocks_encoder` (1,2,3,4,4,4),
`num_blocks_decoder` (1,1,1,1,1)), pool kernels including the leading [1,1,1]
stage, max 320 features, He init, and the last-norm-of-each-residual-block scale
initialized to zero (init_last_bn_before_add_to_0, MultiTalent_meets_resenc.py:31-34).

Layout/precision conventions match models/generic_unet.py (channels-last NDHWC,
bf16 compute, fp32 params + norm statistics, raw logits out, highest resolution
first under deep supervision).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multitalent_tpu.models.blocks import (ConvNormAct, InstanceNorm, he_init,
                                           lrelu, symmetric_padding)
from multitalent_tpu.registry import NETWORKS


class BasicResidualBlock(nn.Module):
    """conv-IN-lrelu-conv-IN + projected skip, joint lrelu. The second norm's scale
    starts at zero so each block is initialized as an identity refinement."""

    features: int
    kernel_size: Sequence[int]
    stride: Sequence[int] | None = None
    negative_slope: float = 1e-2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        stride = tuple(self.stride) if self.stride is not None else (1,) * len(self.kernel_size)
        cin = x.shape[-1]
        y = nn.Conv(self.features, kernel_size=tuple(self.kernel_size), strides=stride,
                    padding=symmetric_padding(self.kernel_size),
                    kernel_init=he_init(self.negative_slope),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        y = InstanceNorm(name="norm1")(y)
        y = lrelu(y, self.negative_slope)
        y = nn.Conv(self.features, kernel_size=tuple(self.kernel_size),
                    padding=symmetric_padding(self.kernel_size),
                    kernel_init=he_init(self.negative_slope),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(y)
        y = InstanceNorm(name="norm2", scale_init=nn.initializers.zeros)(y)

        if any(s != 1 for s in stride) or cin != self.features:
            skip = nn.Conv(self.features, kernel_size=(1,) * len(stride),
                           strides=stride, padding="VALID", use_bias=False,
                           kernel_init=he_init(self.negative_slope),
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="skip_conv")(x)
            skip = InstanceNorm(name="skip_norm")(skip)
        else:
            skip = x
        return lrelu(y + skip.astype(y.dtype), self.negative_slope)


class ResidualStage(nn.Module):
    """`num_blocks` residual blocks; the first carries the stage's stride
    (ResidualLayer parity, conv_blocks.py:233-260)."""

    features: int
    num_blocks: int
    kernel_size: Sequence[int]
    stride: Sequence[int] | None = None
    negative_slope: float = 1e-2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for b in range(self.num_blocks):
            x = BasicResidualBlock(
                self.features, self.kernel_size,
                stride=self.stride if b == 0 else None,
                negative_slope=self.negative_slope, dtype=self.dtype,
                name=f"block{b}")(x)
        return x


@NETWORKS.register(aliases=("FabiansUNet",))
class ResidualEncoderUNet(nn.Module):
    """Input (N, *spatial, C_in) channels-last; returns deep-supervision logits
    highest resolution first (or full-res only)."""

    input_channels: int
    base_num_features: int
    num_classes: int
    pool_op_kernel_sizes: Sequence[Sequence[int]]  # includes the leading [1,1,1]
    conv_kernel_sizes: Sequence[Sequence[int]]
    num_blocks_encoder: Sequence[int]
    num_blocks_decoder: Sequence[int]
    max_num_features: int = 320
    deep_supervision: bool = True
    negative_slope: float = 1e-2
    dtype: Any = jnp.bfloat16

    @property
    def input_shape_must_be_divisible_by(self) -> np.ndarray:
        return np.prod(np.asarray(self.pool_op_kernel_sizes), axis=0)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 deep_supervision: bool | None = None):
        ds = self.deep_supervision if deep_supervision is None else deep_supervision
        num_stages = len(self.pool_op_kernel_sizes)
        assert len(self.num_blocks_encoder) == num_stages
        assert len(self.num_blocks_decoder) == num_stages - 1
        feats = [min(self.base_num_features * 2 ** s, self.max_num_features)
                 for s in range(num_stages)]
        x = x.astype(self.dtype)

        # ---- encoder: initial conv + residual stages -----------------------------
        x = nn.Conv(self.base_num_features, kernel_size=(3,) * (x.ndim - 2),
                    padding=symmetric_padding((3,) * (x.ndim - 2)),
                    kernel_init=he_init(self.negative_slope),
                    dtype=self.dtype, param_dtype=jnp.float32, name="initial_conv")(x)
        x = InstanceNorm(name="initial_norm")(x)
        x = lrelu(x, self.negative_slope)

        skips = []
        for s in range(num_stages):
            x = ResidualStage(
                feats[s], int(self.num_blocks_encoder[s]),
                self.conv_kernel_sizes[s], stride=self.pool_op_kernel_sizes[s],
                negative_slope=self.negative_slope, dtype=self.dtype,
                name=f"enc{s}")(x)
            skips.append(x)

        # ---- plain-conv decoder --------------------------------------------------
        seg_outputs = []
        x = skips[-1]  # bottleneck
        for i, s in enumerate(range(num_stages - 2, -1, -1)):
            stride = tuple(self.pool_op_kernel_sizes[s + 1])
            x = nn.ConvTranspose(feats[s], kernel_size=stride, strides=stride,
                                 padding="VALID", use_bias=False,
                                 kernel_init=he_init(self.negative_slope),
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name=f"up{i}")(x)
            x = jnp.concatenate([x, skips[s].astype(x.dtype)], axis=-1)
            for b in range(int(self.num_blocks_decoder[i])):
                x = ConvNormAct(feats[s], self.conv_kernel_sizes[s],
                                negative_slope=self.negative_slope,
                                dtype=self.dtype, name=f"dec{i}_block{b}")(
                    x, deterministic=deterministic)
            logits = nn.Conv(self.num_classes, kernel_size=(1,) * len(stride),
                             use_bias=True, kernel_init=he_init(self.negative_slope),
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"seg{i}")(x)
            seg_outputs.append(logits.astype(jnp.float32))

        if ds:
            return seg_outputs[::-1]
        return seg_outputs[-1]


def build_resenc_unet_from_plans(plans, stage: int, deep_supervision: bool = True,
                                 dtype=jnp.bfloat16,
                                 num_classes: int | None = None) -> ResidualEncoderUNet:
    st = plans.stage(stage)
    assert st.num_blocks_encoder is not None, \
        "plans do not carry num_blocks_encoder (not residual-encoder plans)"
    return ResidualEncoderUNet(
        input_channels=plans.num_modalities,
        base_num_features=plans.base_num_features,
        num_classes=num_classes if num_classes is not None else plans.num_classes + 1,
        pool_op_kernel_sizes=tuple(tuple(k) for k in st.pool_op_kernel_sizes),
        conv_kernel_sizes=tuple(tuple(k) for k in st.conv_kernel_sizes),
        num_blocks_encoder=tuple(st.num_blocks_encoder),
        num_blocks_decoder=tuple(st.num_blocks_decoder),
        deep_supervision=deep_supervision,
        dtype=dtype,
    )
