"""SwinUNETR: 3D shifted-window transformer encoder + UNETR-style conv decoder,
TPU-native.

Parity target: the MONAI SwinUNETR as used by
custom_trainers/MultiTalent/MultiTalent/MultiTalent_meets_swinunetr.py:21-120
(feature_size 48, 4 swin stages of depth 2 with heads (3,6,12,24), window 7^3,
patch size 2, no deep supervision, Adam 5e-4). Re-implemented rather than wrapped:
windowed multi-head self-attention with cyclic shifts and relative position bias,
patch merging between stages, residual conv decoder blocks with transposed-conv
upsampling and skip concatenation.

TPU notes: window partitioning uses static reshapes only; attention is batched
(B*nWindows, win^3, C) matmuls on the MXU; LayerNorm/params fp32, compute bf16.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multitalent_tpu.models.blocks import InstanceNorm, he_init, lrelu
from multitalent_tpu.registry import NETWORKS


def window_partition(x, ws):
    """(B, D, H, W, C) -> (B*nW, ws^3, C)"""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // ws, ws, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, ws * ws * ws, c)


def window_unpartition(windows, ws, dims):
    b, d, h, w = dims
    x = windows.reshape(b, d // ws, h // ws, w // ws, ws, ws, ws, -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d, h, w, -1)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (nW*B, N, C), N = window_size^3
        nwb, n, c = x.shape
        h = self.num_heads
        head_dim = c // h
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(x)
        qkv = qkv.reshape(nwb, n, 3, h, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        # relative position bias (learned table indexed by 3D offset)
        ws = self.window_size
        table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 3, h), jnp.float32)
        coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), np.arange(ws),
                                      indexing="ij")).reshape(3, -1)  # (3, N)
        rel = coords[:, :, None] - coords[:, None, :] + (ws - 1)  # (3, N, N)
        rel_index = (rel[0] * (2 * ws - 1) ** 2 + rel[1] * (2 * ws - 1)
                     + rel[2]).astype(np.int32)
        bias = jnp.take(table, jnp.asarray(rel_index.reshape(-1)), axis=0)
        bias = bias.reshape(n, n, h).transpose(2, 0, 1)  # (h, N, N)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn / np.sqrt(head_dim) + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(nwb // nw, nw, h, n, n) + mask[None, :, None]
            attn = attn.reshape(nwb, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3)
        out = out.reshape(nwb, n, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


def _shift_attn_mask(dims, ws, shift):
    """Attention mask blocking cross-boundary interaction for shifted windows."""
    d, h, w = dims
    img_mask = np.zeros((1, d, h, w, 1), np.float32)
    cnt = 0
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    for sd in slices:
        for sh in slices:
            for sw in slices:
                img_mask[:, sd, sh, sw, :] = cnt
                cnt += 1
    mask_windows = window_partition(jnp.asarray(img_mask), ws)[..., 0]  # (nW, N)
    diff = mask_windows[:, None, :] - mask_windows[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0)  # (nW, N, N)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: bool = False
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: (B, D, H, W, C); pad spatial dims to window multiples
        b, d, h, w, c = x.shape
        ws = min(self.window_size, d, h, w)
        shift = ws // 2 if self.shift and ws > 1 else 0
        pad = [(0, (ws - s % ws) % ws) for s in (d, h, w)]
        shortcut = x
        y = nn.LayerNorm(param_dtype=jnp.float32, name="norm1")(x)
        y = jnp.pad(y, ((0, 0), *pad, (0, 0)))
        dims = y.shape[1:4]
        if shift:
            y = jnp.roll(y, (-shift, -shift, -shift), axis=(1, 2, 3))
            mask = _shift_attn_mask(dims, ws, shift)
        else:
            mask = None
        windows = window_partition(y, ws)
        attn = WindowAttention(self.dim, self.num_heads, ws, self.dtype,
                               name="attn")(windows, mask)
        y = window_unpartition(attn, ws, (b, *dims))
        if shift:
            y = jnp.roll(y, (shift, shift, shift), axis=(1, 2, 3))
        y = y[:, :d, :h, :w]
        x = shortcut + y.astype(shortcut.dtype)

        z = nn.LayerNorm(param_dtype=jnp.float32, name="norm2")(x)
        z = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp1")(z)
        z = nn.gelu(z)
        z = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp2")(z)
        return x + z.astype(x.dtype)


class PatchMerging(nn.Module):
    """2x downsample: concat 8 neighbors -> LayerNorm -> Dense(2C)."""
    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        pad = [(0, d % 2), (0, h % 2), (0, w % 2)]
        x = jnp.pad(x, ((0, 0), *pad, (0, 0)))
        d2, h2, w2 = x.shape[1:4]
        x = x.reshape(b, d2 // 2, 2, h2 // 2, 2, w2 // 2, 2, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b, d2 // 2, h2 // 2, w2 // 2, 8 * c)
        x = nn.LayerNorm(param_dtype=jnp.float32)(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)


class UnetrBasicBlock(nn.Module):
    """Two conv-InstanceNorm-lrelu layers with a residual projection (MONAI
    UnetrBasicBlock / UnetResBlock role)."""
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        y = nn.Conv(self.features, (3, 3, 3), padding=1,
                    kernel_init=he_init(), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        y = InstanceNorm(name="norm1")(y)
        y = lrelu(y)
        y = nn.Conv(self.features, (3, 3, 3), padding=1,
                    kernel_init=he_init(), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(y)
        y = InstanceNorm(name="norm2")(y)
        if cin != self.features:
            x = nn.Conv(self.features, (1, 1, 1), use_bias=False,
                        kernel_init=he_init(), dtype=self.dtype,
                        param_dtype=jnp.float32, name="res")(x)
            x = InstanceNorm(name="res_norm")(x)
        return lrelu(y + x.astype(y.dtype))


class UnetrUpBlock(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip):
        x = nn.ConvTranspose(self.features, (2, 2, 2), strides=(2, 2, 2),
                             padding="VALID", use_bias=False,
                             kernel_init=he_init(), dtype=self.dtype,
                             param_dtype=jnp.float32, name="up")(x)
        x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        return UnetrBasicBlock(self.features, self.dtype, name="block")(x)


@NETWORKS.register(aliases=("SwinUNETR",))
class SwinUNETR(nn.Module):
    """Input (B, D, H, W, C_in) channels-last; spatial dims divisible by 32.
    Returns full-resolution logits (no deep supervision, matching the reference
    trainer's do_ds=False)."""

    in_channels: int = 1
    out_channels: int = 2
    feature_size: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    dtype: Any = jnp.bfloat16

    @property
    def input_shape_must_be_divisible_by(self) -> int:
        return 32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 deep_supervision: bool | None = None):
        fs = self.feature_size
        x = x.astype(self.dtype)
        skip0 = UnetrBasicBlock(fs, self.dtype, name="encoder0")(x)

        # patch embedding: stride-2 conv (patch size 2)
        y = nn.Conv(fs, (2, 2, 2), strides=(2, 2, 2), dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_embed")(x)
        hidden = []
        dim = fs
        for stage, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for blk in range(depth):
                y = SwinBlock(dim, heads, self.window_size, shift=bool(blk % 2),
                              dtype=self.dtype, name=f"stage{stage}_block{blk}")(y)
            hidden.append(y)
            if stage < len(self.depths) - 1:
                y = PatchMerging(dim, self.dtype, name=f"merge{stage}")(y)
                dim *= 2
        # one more merge for the bottleneck (MONAI's hidden_states[4])
        y = PatchMerging(dim, self.dtype, name="merge_final")(y)

        enc1 = UnetrBasicBlock(fs, self.dtype, name="encoder1")(hidden[0])
        enc2 = UnetrBasicBlock(fs * 2, self.dtype, name="encoder2")(hidden[1])
        enc3 = UnetrBasicBlock(fs * 4, self.dtype, name="encoder3")(hidden[2])
        enc4 = UnetrBasicBlock(fs * 8, self.dtype, name="encoder4")(hidden[3])
        bottleneck = UnetrBasicBlock(fs * 16, self.dtype, name="encoder10")(y)

        d4 = UnetrUpBlock(fs * 8, self.dtype, name="decoder5")(bottleneck, enc4)
        d3 = UnetrUpBlock(fs * 4, self.dtype, name="decoder4")(d4, enc3)
        d2 = UnetrUpBlock(fs * 2, self.dtype, name="decoder3")(d3, enc2)
        d1 = UnetrUpBlock(fs, self.dtype, name="decoder2")(d2, enc1)
        d0 = UnetrUpBlock(fs, self.dtype, name="decoder1")(d1, skip0)
        logits = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="out")(d0)
        return logits.astype(jnp.float32)
