"""Fused InstanceNorm + LeakyReLU as Pallas TPU kernels.

The reference runs InstanceNorm3d + LeakyReLU after every conv (generic_UNet.py:28-88
ConvDropoutNormNonlin). Under XLA these lower to two reduction passes plus an
elementwise pass over the conv output — at nnU-Net's activation sizes (e.g.
2x96x192x192x30 bf16 = 850 MB per layer) every extra HBM sweep is milliseconds.

This module implements the op as two Pallas passes over a (N, S, C) view
(S = flattened spatial):

1. `_stats_kernel` — one sweep accumulating per-(sample, channel) sum and sum-of-
   squares in fp32 VMEM scratch across spatial chunks (TPU grids iterate the last
   axis sequentially, so the scratch carries across chunk steps).
2. `_apply_kernel` — one sweep computing lrelu((x - mean) * rsqrt(var + eps) * scale
   + bias), i.e. normalize + affine + activation fused into a single HBM read/write.

Net: 2 reads + 1 write of the activation, the floor for any two-pass normalization,
with the activation folded in for free. Exposed via `fused_instance_norm_lrelu`,
which runs the kernels with `interpret=True` off-TPU so CPU tests exercise the same
code path. Numerics: stats and normalization in fp32 regardless of input dtype,
matching models/blocks.py InstanceNorm.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _stats_kernel(x_ref, sum_ref, sq_ref, acc_ref):
    """Grid (N, n_chunks): accumulate fp32 sum/sumsq over spatial chunks.
    Stats outputs are (N, 1, C) so every block keeps TPU-tileable trailing dims."""
    j = pl.program_id(1)
    xf = x_ref[0].astype(jnp.float32)  # (chunk, C)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[0] += jnp.sum(xf, axis=0)
    acc_ref[1] += jnp.sum(xf * xf, axis=0)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        sum_ref[0, 0] = acc_ref[0]
        sq_ref[0, 0] = acc_ref[1]


def _apply_kernel(x_ref, mean_ref, rstd_ref, scale_ref, bias_ref, out_ref, *,
                  negative_slope: float):
    xf = x_ref[0].astype(jnp.float32)
    y = (xf - mean_ref[0, 0]) * rstd_ref[0, 0] * scale_ref[0, 0] + bias_ref[0, 0]
    y = jnp.where(y >= 0, y, y * negative_slope)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("negative_slope", "epsilon", "interpret"))
def fused_instance_norm_lrelu(x, scale, bias, *, negative_slope: float = 1e-2,
                              epsilon: float = 1e-5, interpret: bool | None = None):
    """InstanceNorm (per-sample, per-channel over spatial) + affine + LeakyReLU.

    x: (N, *spatial, C); scale/bias: (C,). Returns the same shape/dtype as x.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n, *spatial, c = x.shape
    s = 1
    for d in spatial:
        s *= d
    xv = x.reshape(n, s, c)

    # spatial chunking: big enough to amortize grid overhead, small enough for VMEM.
    # C is lane-padded to 128 in VMEM, so budget by the padded width: ~1 MB per
    # (chunk, C) block keeps stats (2x double-buffered) and apply (in+out, double-
    # buffered) comfortably under the 16 MB VMEM limit for fp32 and bf16 alike.
    padded_c = _round_up(c, 128)
    itemsize = jnp.dtype(x.dtype).itemsize
    chunk = min(s, _round_up(max(512, (1 << 20) // (padded_c * itemsize)), 8))
    n_chunks = -(-s // chunk)
    pad_s = n_chunks * chunk
    if pad_s != s:
        # zero padding is exact for sum/sumsq; divide by true S below
        xv = jnp.pad(xv, ((0, 0), (0, pad_s - s), (0, 0)))

    sums, sqs = pl.pallas_call(
        _stats_kernel,
        grid=(n, n_chunks),
        in_specs=[pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1, c), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=interpret,
    )(xv)

    mean = sums / s  # (n, 1, c)
    var = jnp.maximum(sqs / s - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + epsilon)

    scale_b = jnp.broadcast_to(scale.astype(jnp.float32)[None, None], (n, 1, c))
    bias_b = jnp.broadcast_to(bias.astype(jnp.float32)[None, None], (n, 1, c))

    out = pl.pallas_call(
        functools.partial(_apply_kernel, negative_slope=negative_slope),
        grid=(n, n_chunks),
        in_specs=[pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, pad_s, c), x.dtype),
        interpret=interpret,
    )(xv, mean, rstd, scale_b, bias_b)

    if pad_s != s:
        out = out[:, :s]
    return out.reshape(x.shape)
