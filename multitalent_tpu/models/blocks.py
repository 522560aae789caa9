"""Flax building blocks for the U-Net family.

TPU-native equivalents of the reference's torch blocks (generic_UNet.py:28-144
ConvDropoutNormNonlin / StackedConvLayers): channels-LAST (NDHWC) layout so XLA maps
convolutions onto the MXU without layout transposes, InstanceNorm statistics in fp32,
bf16 compute dtype for the conv path. Norm+activation are plain XLA ops — the compiler
fuses them into the convolution epilogue (verified via jit HLO; a Pallas fusion is kept
in ops/ for cases XLA does not fuse).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# He (kaiming) normal init with leaky-relu negative slope 0.01, fan_in — the reference
# initializes all convs with InitWeights_He(1e-2) (initialization.py:19-27).
def he_init(negative_slope: float = 1e-2):
    gain = 2.0 / (1.0 + negative_slope ** 2)
    return nn.initializers.variance_scaling(gain, "fan_in", "normal")


class InstanceNorm(nn.Module):
    """InstanceNorm with affine params: per-sample, per-channel normalization over the
    spatial dims. Stats are computed in fp32 regardless of compute dtype."""

    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    scale_init: Any = nn.initializers.ones  # zeros for last-norm-zero residual init

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        axes = tuple(range(1, x.ndim - 1))  # spatial dims only
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(orig_dtype)


def lrelu(x, negative_slope=1e-2):
    return nn.leaky_relu(x, negative_slope=negative_slope)


def symmetric_padding(kernel_size) -> tuple[tuple[int, int], ...]:
    """torch-style conv padding: (k-1)//2 on both sides of each spatial dim."""
    return tuple(((k - 1) // 2, (k - 1) // 2) for k in kernel_size)


class ConvNormAct(nn.Module):
    """conv -> (dropout) -> InstanceNorm -> LeakyReLU (ConvDropoutNormNonlin parity)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    negative_slope: float = 1e-2
    dropout_rate: float = 0.0
    dtype: Any = jnp.bfloat16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        strides = tuple(self.strides) if self.strides is not None else (1,) * len(self.kernel_size)
        x = nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=strides,
            # explicit symmetric (k-1)//2 padding: for strided convs XLA's SAME
            # pads asymmetrically (low 0 / high 1), which would misalign windows
            # vs the reference's torch padding=(k-1)//2 and break weight import
            padding=symmetric_padding(self.kernel_size),
            use_bias=self.use_bias,
            kernel_init=he_init(self.negative_slope),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = InstanceNorm(name="norm")(x)
        return lrelu(x, self.negative_slope)


class ConvStage(nn.Module):
    """`num_convs` ConvNormAct blocks; the first may be strided (convolutional pooling).
    StackedConvLayers parity (generic_UNet.py:89-144)."""

    features: int
    num_convs: int
    kernel_size: Sequence[int]
    first_stride: Sequence[int] | None = None
    negative_slope: float = 1e-2
    dropout_rate: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i in range(self.num_convs):
            x = ConvNormAct(
                self.features,
                self.kernel_size,
                strides=self.first_stride if i == 0 else None,
                negative_slope=self.negative_slope,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, deterministic=deterministic)
        return x
