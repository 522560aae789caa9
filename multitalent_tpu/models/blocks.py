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


def use_pallas_norm() -> bool:
    """Opt-in switch for the Pallas fused InstanceNorm+LeakyReLU kernel
    (ops/fused_norm.py). Off by default: XLA's fusion of the plain formulation is
    the measured baseline; the Pallas path guarantees the 2-read/1-write floor
    independent of XLA's fusion decisions."""
    import os
    return os.environ.get("MTTPU_PALLAS_NORM", "0") == "1"


class InstanceNorm(nn.Module):
    """InstanceNorm with affine params: per-sample, per-channel normalization over the
    spatial dims. Stats are computed in fp32 regardless of compute dtype.

    With `fuse_lrelu=True` the op runs as the Pallas fused-norm kernel
    (ops/fused_norm.py) with the LeakyReLU folded into the normalize pass; the
    parameter tree is identical either way."""

    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    scale_init: Any = nn.initializers.ones  # zeros for last-norm-zero residual init
    fuse_lrelu: bool = False
    negative_slope: float = 1e-2

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.fuse_lrelu:
            from multitalent_tpu.ops.fused_norm import fused_instance_norm_lrelu
            return fused_instance_norm_lrelu(
                x, scale, bias, negative_slope=self.negative_slope,
                epsilon=self.epsilon)
        xf = x.astype(jnp.float32)
        axes = tuple(range(1, x.ndim - 1))  # spatial dims only
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(orig_dtype)


class BatchNormBatchStats(nn.Module):
    """BatchNorm for the BN ablation trainers (nnUNetTrainerV2_BN, generic_UNet.py via
    norm_op=nn.BatchNorm3d). Normalizes over (batch, spatial) with affine params.

    Deviation from torch BN: no running-average statistics are tracked — evaluation
    also uses the current batch's statistics. Keeping the module stateless keeps the
    train step a pure function of (params, batch); these are ablation trainers, not
    the production path."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))  # batch + spatial
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(orig_dtype)


class FRN(nn.Module):
    """Filter Response Normalization + thresholded linear unit (the reference's FRN3D,
    custom_modules/feature_response_normalization.py:23-37): x <- x * rsqrt(mean(x^2)
    over spatial + eps), then max(w*x + b, tau). Subsumes the nonlinearity — blocks
    using FRN skip their activation, matching nnUNetTrainerV2_FRN."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        tau = self.param("tau", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        axes = tuple(range(1, x.ndim - 1))  # per-sample spatial mean, like FRN3D
        nu2 = jnp.mean(jnp.square(xf), axis=axes, keepdims=True)
        y = xf * jax.lax.rsqrt(nu2 + self.epsilon)
        return jnp.maximum(weight * y + bias, tau).astype(orig_dtype)


def make_norm(norm: str, name: str):
    """Norm factory for the architectural-variant trainers
    (nnUNet_variants/architectural_variants: _BN, _GN, _FRN, _NoNormalization)."""
    if norm == "instance":
        return InstanceNorm(name=name)
    if norm == "batch":
        return BatchNormBatchStats(name=name)
    if norm == "group":
        # the reference's MyGroupNorm uses num_groups=8 (nnUNetTrainerV2_GN.py:39)
        return nn.GroupNorm(num_groups=8, epsilon=1e-5, name=name,
                            param_dtype=jnp.float32)
    if norm == "frn":
        return FRN(name=name)
    if norm == "none":
        return lambda x: x
    raise ValueError(f"unknown norm {norm!r}")


def apply_nonlin(nonlin: str, x, negative_slope: float = 1e-2):
    """Activation zoo of the variant trainers (_GeLU, _Mish, _ReLU,
    _LReLU_slope_2en1). FRN embeds its own TLU, so 'none' is valid."""
    if nonlin == "leaky_relu":
        return lrelu(x, negative_slope)
    if nonlin == "relu":
        return nn.relu(x)
    if nonlin == "gelu":
        return nn.gelu(x)
    if nonlin == "mish":
        return x * jnp.tanh(nn.softplus(x))
    if nonlin == "none":
        return x
    raise ValueError(f"unknown nonlin {nonlin!r}")


def lrelu(x, negative_slope=1e-2):
    # max(x, slope*x): bitwise-identical to the where-based leaky_relu for
    # 0<slope<1, one VPU op instead of compare+select (fuses better on TPU)
    return jnp.maximum(x, x * negative_slope)


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
    norm: str = "instance"
    nonlin: str = "leaky_relu"
    # conv -> nonlin -> norm block order (ConvDropoutNonlinNorm,
    # generic_UNet.py:73-86 / nnUNetTrainerV2_ReLU_convReLUIN.py:43)
    nonlin_first: bool = False

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
        if self.nonlin_first:
            x = apply_nonlin(self.nonlin, x, self.negative_slope)
            return make_norm(self.norm, "norm")(x)
        if (self.norm == "instance" and self.nonlin == "leaky_relu"
                and use_pallas_norm()):
            return InstanceNorm(name="norm", fuse_lrelu=True,
                                negative_slope=self.negative_slope)(x)
        x = make_norm(self.norm, "norm")(x)
        # FRN's thresholded linear unit replaces the activation (nnUNetTrainerV2_FRN)
        nonlin = "none" if self.norm == "frn" else self.nonlin
        return apply_nonlin(nonlin, x, self.negative_slope)


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
    norm: str = "instance"
    nonlin: str = "leaky_relu"
    nonlin_first: bool = False

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
                norm=self.norm,
                nonlin=self.nonlin,
                nonlin_first=self.nonlin_first,
                name=f"block{i}",
            )(x, deterministic=deterministic)
        return x
