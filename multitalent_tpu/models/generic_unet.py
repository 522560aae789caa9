"""GenericUNet: the configurable plain-conv U-Net family, TPU-native.

Architecture parity with the reference Generic_UNet as instantiated by the production
trainer (generic_UNet.py:156-401 with convolutional_pooling=convolutional_upsampling=
True, InstanceNorm+LeakyReLU(0.01), no dropout, per-stage deep-supervision heads,
max 320 features in 3D):

- encoder stage d: `conv_per_stage` convs at features min(base*2^d, max); the first
  conv of stages d>0 is strided by the previous pooling kernel (stride-conv pooling)
- bottleneck: strided stage at min(base*2^num_pool, max)
- decoder stage u: transposed conv (kernel=stride=pool kernel) down to the skip's
  feature count, concat skip, `conv_per_stage` convs
- one 1x1(x1) seg head per decoder stage, bias-free; outputs are raw logits ordered
  highest-resolution first (softmax/sigmoid is applied by losses/inference, never here)

TPU-first differences: channels-last NDHWC layout, bf16 compute with fp32 params and
fp32 norm statistics, functional module (no inference engine inside the model — the
sliding-window engine lives in ops/sliding_window.py).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multitalent_tpu.models.blocks import ConvStage, he_init
from multitalent_tpu.registry import NETWORKS


def compute_stage_features(base_num_features: int, num_stages: int, max_num_features: int) -> list[int]:
    return [min(base_num_features * 2 ** d, max_num_features) for d in range(num_stages)]


@NETWORKS.register(aliases=("Generic_UNet",))
class GenericUNet(nn.Module):
    """Input: (N, *spatial, C_in) channels-last. Returns a list of logits
    [(N, *spatial, num_classes), (N, *spatial/2, ...), ...] highest resolution first
    when deep_supervision, else the full-resolution logits only."""

    input_channels: int
    base_num_features: int
    num_classes: int
    pool_op_kernel_sizes: Sequence[Sequence[int]]
    conv_kernel_sizes: Sequence[Sequence[int]]
    conv_per_stage: int = 2
    max_num_features: int = 320
    deep_supervision: bool = True
    negative_slope: float = 1e-2
    dropout_rate: float = 0.0
    dtype: Any = jnp.bfloat16
    # architectural-variant knobs (nnUNet_variants/architectural_variants):
    # norm in {instance,batch,group,frn,none}; nonlin in {leaky_relu,relu,gelu,mish}
    norm: str = "instance"
    nonlin: str = "leaky_relu"
    # conv -> nonlin -> norm order (basic_block=ConvDropoutNonlinNorm variants)
    nonlin_first: bool = False
    seg_output_bias: bool = False  # _biasInSegOutput variants

    @property
    def num_pool(self) -> int:
        return len(self.pool_op_kernel_sizes)

    @property
    def input_shape_must_be_divisible_by(self) -> np.ndarray:
        return np.prod(np.asarray(self.pool_op_kernel_sizes), axis=0)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, deep_supervision: bool | None = None):
        ds = self.deep_supervision if deep_supervision is None else deep_supervision
        num_pool = self.num_pool
        feats = compute_stage_features(self.base_num_features, num_pool + 1,
                                       self.max_num_features)
        x = x.astype(self.dtype)

        # ---- encoder -------------------------------------------------------------
        skips = []
        for d in range(num_pool):
            x = ConvStage(
                features=feats[d],
                num_convs=self.conv_per_stage,
                kernel_size=self.conv_kernel_sizes[d],
                first_stride=self.pool_op_kernel_sizes[d - 1] if d > 0 else None,
                negative_slope=self.negative_slope,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                norm=self.norm,
                nonlin=self.nonlin,
                nonlin_first=self.nonlin_first,
                name=f"enc{d}",
            )(x, deterministic=deterministic)
            skips.append(x)

        # ---- bottleneck ----------------------------------------------------------
        x = ConvStage(
            features=feats[num_pool],
            num_convs=self.conv_per_stage,
            kernel_size=self.conv_kernel_sizes[num_pool],
            first_stride=self.pool_op_kernel_sizes[num_pool - 1],
            negative_slope=self.negative_slope,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            norm=self.norm,
            nonlin=self.nonlin,
            name="bottleneck",
        )(x, deterministic=deterministic)

        # ---- decoder + deep-supervision heads ------------------------------------
        seg_outputs = []
        for u in range(num_pool):
            skip = skips[num_pool - 1 - u]
            f_skip = feats[num_pool - 1 - u]
            stride = tuple(self.pool_op_kernel_sizes[num_pool - 1 - u])
            x = nn.ConvTranspose(
                features=f_skip,
                kernel_size=stride,
                strides=stride,
                padding="VALID",
                use_bias=False,
                kernel_init=he_init(self.negative_slope),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"up{u}",
            )(x)
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = ConvStage(
                features=f_skip,
                num_convs=self.conv_per_stage,
                kernel_size=self.conv_kernel_sizes[num_pool - u],
                negative_slope=self.negative_slope,
                dropout_rate=0.0,  # reference never uses dropout in the decoder
                dtype=self.dtype,
                norm=self.norm,
                nonlin=self.nonlin,
                nonlin_first=self.nonlin_first,
                name=f"dec{u}",
            )(x, deterministic=deterministic)
            logits = nn.Conv(
                self.num_classes,
                kernel_size=(1,) * len(stride),
                use_bias=self.seg_output_bias,
                kernel_init=he_init(self.negative_slope),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"seg{u}",
            )(x)
            seg_outputs.append(logits.astype(jnp.float32))

        if ds:
            return seg_outputs[::-1]  # highest resolution first
        return seg_outputs[-1]


def build_unet_from_plans(plans, stage: int, deep_supervision: bool = True,
                          dtype=jnp.bfloat16, num_classes: int | None = None,
                          **overrides) -> GenericUNet:
    """Instantiate GenericUNet from a Plans object for the given resolution stage
    (the wiring nnUNetTrainerV2.initialize_network derives from process_plans).
    `overrides` lets variant trainers swap norm/nonlin/conv_per_stage/... the way the
    reference's architectural-variant trainers re-call the Generic_UNet constructor
    (e.g. nnUNetTrainerV2_GN.py:24-52, nnUNetTrainerV2_3ConvPerStage.py:22-46)."""
    st = plans.stage(stage)
    kwargs = dict(
        input_channels=plans.num_modalities,
        base_num_features=plans.base_num_features,
        num_classes=num_classes if num_classes is not None else plans.num_classes + 1,
        pool_op_kernel_sizes=tuple(tuple(k) for k in st.pool_op_kernel_sizes),
        conv_kernel_sizes=tuple(tuple(k) for k in st.conv_kernel_sizes),
        conv_per_stage=plans.conv_per_stage,
        max_num_features=320 if len(st.patch_size) == 3 else 480,
        deep_supervision=deep_supervision,
        dtype=dtype,
    )
    kwargs.update(overrides)
    return GenericUNet(**kwargs)
