"""Torch checkpoint -> flax parameter conversion for Generic_UNet-family models.

Purpose: load the released MultiTalent zenodo weights (trained with the reference
torch code) into this framework's flax GenericUNet (SURVEY "checkpoint
compatibility": honoring the `module.` DDP prefix, nnUNetTrainerV2_DDP.py:650-661).

Key mapping (torch Generic_UNet, generic_UNet.py:156-401 -> models/generic_unet.py):

  conv_blocks_context.{d}.blocks.{i}.conv        -> enc{d}/block{i}/conv
  conv_blocks_context.{d}.blocks.{i}.instnorm    -> enc{d}/block{i}/norm
  conv_blocks_context.{P}.0.blocks.0 (P=num_pool)-> bottleneck/block0
  conv_blocks_context.{P}.1.blocks.0             -> bottleneck/block1
  tu.{u}                                         -> up{u}
  conv_blocks_localization.{u}.0.blocks.{i}      -> dec{u}/block{i}
  conv_blocks_localization.{u}.1.blocks.0        -> dec{u}/block{num_convs-1}
  seg_outputs.{u}                                -> seg{u}

Layout: torch Conv3d (O, I, kz, ky, kx) -> flax (kz, ky, kx, I, O);
torch ConvTranspose3d (I, O, kz, ky, kx) -> flax ConvTranspose (kz, ky, kx, I, O).
Both conversions are validated numerically in tests/test_torch_convert.py against
a freshly-built torch network.
"""
from __future__ import annotations

import re

import numpy as np


def _conv_weight(w: np.ndarray) -> np.ndarray:
    """(O, I, *k) -> (*k, I, O)"""
    nd = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nd)) + (1, 0))


def _transpconv_weight(w: np.ndarray) -> np.ndarray:
    """(I, O, *k) -> (*k, I, O), spatially flipped: torch's ConvTranspose places
    kernel tap k at output offset k, while flax/lax.conv_transpose applies the
    kernel mirrored (validated numerically in tests/test_torch_convert.py)."""
    nd = w.ndim - 2
    out = np.transpose(w, tuple(range(2, 2 + nd)) + (0, 1))
    return out[(slice(None, None, -1),) * nd]


def strip_module_prefix(state_dict: dict) -> dict:
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in state_dict.items()}


def convert_generic_unet_state_dict(state_dict: dict, num_pool: int,
                                    conv_per_stage: int = 2) -> dict:
    """Torch Generic_UNet state_dict (numpy or torch tensors) -> nested flax param
    dict matching models/generic_unet.GenericUNet."""
    sd = {}
    for k, v in strip_module_prefix(state_dict).items():
        sd[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                           dtype=np.float32)

    params: dict = {}

    def put(path: list[str], leaf_name: str, value: np.ndarray) -> None:
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf_name] = value

    def convert_block(torch_prefix: str, flax_path: list[str]) -> None:
        put(flax_path + ["conv"], "kernel", _conv_weight(sd[f"{torch_prefix}.conv.weight"]))
        put(flax_path + ["conv"], "bias", sd[f"{torch_prefix}.conv.bias"])
        put(flax_path + ["norm"], "scale", sd[f"{torch_prefix}.instnorm.weight"])
        put(flax_path + ["norm"], "bias", sd[f"{torch_prefix}.instnorm.bias"])

    # encoder stages 0..num_pool-1
    for d in range(num_pool):
        for i in range(conv_per_stage):
            convert_block(f"conv_blocks_context.{d}.blocks.{i}",
                          [f"enc{d}", f"block{i}"])
    # bottleneck: Sequential(StackedConvLayers(conv_per_stage-1), StackedConvLayers(1))
    for i in range(conv_per_stage - 1):
        convert_block(f"conv_blocks_context.{num_pool}.0.blocks.{i}",
                      ["bottleneck", f"block{i}"])
    convert_block(f"conv_blocks_context.{num_pool}.1.blocks.0",
                  ["bottleneck", f"block{conv_per_stage - 1}"])

    # decoder
    for u in range(num_pool):
        put([f"up{u}"], "kernel", _transpconv_weight(sd[f"tu.{u}.weight"]))
        for i in range(conv_per_stage - 1):
            convert_block(f"conv_blocks_localization.{u}.0.blocks.{i}",
                          [f"dec{u}", f"block{i}"])
        convert_block(f"conv_blocks_localization.{u}.1.blocks.0",
                      [f"dec{u}", f"block{conv_per_stage - 1}"])
        put([f"seg{u}"], "kernel", _conv_weight(sd[f"seg_outputs.{u}.weight"]))

    return params


def load_reference_checkpoint(path: str):
    """Load a reference .model checkpoint file (torch serialized dict with
    'state_dict' etc., network_trainer.py:256-286)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt["state_dict"]
