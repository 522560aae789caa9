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


def _as_numpy_state_dict(state_dict: dict) -> dict:
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, dtype=np.float32)
            for k, v in strip_module_prefix(state_dict).items()}


def convert_fabians_unet_state_dict(state_dict: dict, num_stages: int,
                                    num_blocks_encoder,
                                    num_blocks_decoder) -> dict:
    """Torch FabiansUNet state_dict -> nested flax param dict matching
    models/residual_unet.ResidualEncoderUNet.

    Reference structure (generic_modular_residual_UNet.py:28-140,320-373;
    conv_blocks.py:116-230,330-357; generic_modular_UNet.py:185-256):

      encoder.initial_conv / initial_norm          -> initial_conv / initial_norm
      encoder.stages.{s}.convs.{b}.conv1/norm1/
        conv2/norm2                                -> enc{s}/block{b}/...
      encoder.stages.{s}.convs.{b}.downsample_skip.
        {0: 1x1 conv (no bias), 1: norm}           -> enc{s}/block{b}/skip_conv
                                                      / skip_norm
      decoder.tus.{i}                              -> up{i}
      decoder.stages.{i}.convs.{b}.conv/norm       -> dec{i}_block{b}/conv/norm
      decoder.deep_supervision_outputs.{i}         -> seg{i}

    Quirks honored:
    - all resenc convs are bias-free (get_default_network_config's
      conv_op_kwargs bias=False, generic_modular_UNet.py:67) while the flax
      modules carry bias params -> biases are zero-filled (identical output);
    - older checkpoints name the final head `decoder.segmentation_output`
      instead of `deep_supervision_outputs.{last}`; the reference patches this
      at load (nnUNetTrainerV2_DDP.py:650-661) and so does this converter;
    - ConvDropoutNormReLU registers its submodules twice (as attributes and
      inside the `all` Sequential, conv_blocks.py:149-182) so the state dict
      also carries `...all.{0,2}.*` duplicates — read by canonical name only.
    """
    sd = _as_numpy_state_dict(state_dict)
    num_dec = num_stages - 1
    last = f"decoder.deep_supervision_outputs.{num_dec - 1}"
    for suffix in ("weight", "bias"):
        quirk = f"decoder.segmentation_output.{suffix}"
        if quirk in sd and f"{last}.{suffix}" not in sd:
            sd[f"{last}.{suffix}"] = sd.pop(quirk)

    params: dict = {}

    def put(path, leaf_name, value):
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf_name] = value

    def conv(path, prefix, transp=False, bias="zero"):
        w = sd[f"{prefix}.weight"]
        put(path, "kernel",
            _transpconv_weight(w) if transp else _conv_weight(w))
        if bias == "zero":
            put(path, "bias", np.zeros(path_out_features(w, transp),
                                       np.float32))
        elif bias == "load":
            put(path, "bias", sd[f"{prefix}.bias"])

    def path_out_features(w, transp):
        return w.shape[1] if transp else w.shape[0]

    def norm(path, prefix):
        put(path, "scale", sd[f"{prefix}.weight"])
        put(path, "bias", sd[f"{prefix}.bias"])

    conv(["initial_conv"], "encoder.initial_conv")
    norm(["initial_norm"], "encoder.initial_norm")
    for s in range(num_stages):
        for b in range(int(num_blocks_encoder[s])):
            tp = f"encoder.stages.{s}.convs.{b}"
            fp = [f"enc{s}", f"block{b}"]
            conv(fp + ["conv1"], f"{tp}.conv1")
            norm(fp + ["norm1"], f"{tp}.norm1")
            conv(fp + ["conv2"], f"{tp}.conv2")
            norm(fp + ["norm2"], f"{tp}.norm2")
            if f"{tp}.downsample_skip.0.weight" in sd:
                w = sd[f"{tp}.downsample_skip.0.weight"]
                put(fp + ["skip_conv"], "kernel", _conv_weight(w))
                norm(fp + ["skip_norm"], f"{tp}.downsample_skip.1")
    for i in range(num_dec):
        put([f"up{i}"], "kernel",
            _transpconv_weight(sd[f"decoder.tus.{i}.weight"]))
        for b in range(int(num_blocks_decoder[i])):
            tp = f"decoder.stages.{i}.convs.{b}"
            fp = [f"dec{i}_block{b}"]
            conv(fp + ["conv"], f"{tp}.conv")
            norm(fp + ["norm"], f"{tp}.norm")
        conv([f"seg{i}"], f"decoder.deep_supervision_outputs.{i}",
             bias="load")
    return params


def load_reference_checkpoint(path: str):
    """Load a reference .model checkpoint file (torch serialized dict with
    'state_dict' etc., network_trainer.py:256-286)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt["state_dict"]
