"""Pretrained model zoo: download table, zip install, and conversion of
reference-trained torch checkpoints into this framework's format.

Parity target: nnunet/inference/pretrained_models/download_pretrained_model.py
(task -> URL table incl. the Task100_MultiTalent zenodo zip :226-231, install from
zip, and the post-install MultiTalent folder-rename fixups :274-280). On top of
the reference behavior, `import_reference_model_folder` converts the torch
`.model` checkpoints inside an installed model folder into flax checkpoints via
io/torch_convert.py, so the released MultiTalent weights run on TPU.
"""
from __future__ import annotations

import os
import zipfile

from multitalent_tpu import paths
from multitalent_tpu.utils.fileops import maybe_mkdir, subdirs, subfiles

# task -> (url, description) — the reference's table trimmed to the entries the
# MultiTalent workflow uses; extend as needed
AVAILABLE_MODELS: dict[str, dict] = {
    "Task100_MultiTalent": {
        "description": "MultiTalent: multi-dataset CT segmentation (47 regions). "
                       "Plain U-Net + residual-encoder U-Net, 5-fold CV.",
        "url": "https://zenodo.org/record/7510286/files/MultiTalent_models.zip",
    },
    "Task003_Liver": {
        "description": "Liver and liver tumor (MSD)",
        "url": "https://zenodo.org/record/4003545/files/Task003_Liver.zip",
    },
    "Task004_Hippocampus": {
        "description": "Hippocampus head/body (MSD)",
        "url": "https://zenodo.org/record/4003545/files/Task004_Hippocampus.zip",
    },
}


def print_available_pretrained_models() -> None:
    print("Available pretrained models:")
    for name, info in AVAILABLE_MODELS.items():
        print(f"  {name}: {info['description']}\n    {info['url']}")


def download_and_install_pretrained_model_by_name(task_name: str) -> None:
    if task_name not in AVAILABLE_MODELS:
        raise ValueError(f"unknown pretrained model {task_name!r}; "
                         f"known: {sorted(AVAILABLE_MODELS)}")
    url = AVAILABLE_MODELS[task_name]["url"]
    try:
        import urllib.request
        target = os.path.join(paths.network_training_output_dir(),
                              f"{task_name}.zip")
        print(f"downloading {url} ...")
        urllib.request.urlretrieve(url, target)
        install_model_from_zip_file(target)
        os.remove(target)
    except OSError as e:
        raise RuntimeError(
            f"Download failed ({e}). If this machine has no internet access, "
            f"download {url} elsewhere and install it with "
            "install_model_from_zip_file(<zip>).") from e


def install_model_from_zip_file(zip_file: str) -> None:
    """Extract a model zip into RESULTS_FOLDER/nnUNet and apply the MultiTalent
    folder-rename fixups (download_pretrained_model.py:274-280: the released zip
    names trainer output dirs differently than the trainer expects)."""
    out_dir = paths.network_training_output_dir()
    with zipfile.ZipFile(zip_file) as z:
        z.extractall(out_dir)
    _apply_multitalent_fixups(out_dir)
    print(f"installed into {out_dir}")


def _apply_multitalent_fixups(out_dir: str) -> None:
    renames = {
        "MultiTalent_trainer": "MultiTalent_trainer_ddp",
        "MultiTalent_trainer_resenc": "MultiTalent_trainer_resenc_ddp",
    }
    task_dir = os.path.join(out_dir, "3d_fullres", "Task100_MultiTalent")
    if not os.path.isdir(task_dir):
        return
    for d in subdirs(task_dir, join=False):
        base = d.split("__")[0]
        if base in renames:
            new = d.replace(base, renames[base], 1)
            os.rename(os.path.join(task_dir, d), os.path.join(task_dir, new))
            print(f"renamed {d} -> {new}")


def import_reference_model_folder(model_folder: str, trainer_name: str,
                                  num_classes: int | None = None) -> None:
    """Convert every fold's torch checkpoint(s) in a reference-trained model
    folder into flax checkpoints loadable by this framework.

    Requires the folder to contain plans.pkl and fold_X/model_final_checkpoint.model
    (the reference layout). Writes fold_X/model_final_checkpoint.ckpt[.pkl]."""
    import pickle

    import jax
    import numpy as np
    from flax import serialization

    from multitalent_tpu.io.torch_convert import (convert_generic_unet_state_dict,
                                                  load_reference_checkpoint)
    from multitalent_tpu.plans import load_plans
    from multitalent_tpu.registry import resolve_trainer

    plans_path = os.path.join(model_folder, "plans.pkl")
    assert os.path.isfile(plans_path), f"missing {plans_path}"
    plans = load_plans(plans_path)

    trainer_cls = resolve_trainer(trainer_name)
    for fold_dir in subdirs(model_folder, prefix="fold_"):
        torch_ckpts = subfiles(fold_dir, suffix=".model")
        for tc in torch_ckpts:
            name = os.path.basename(tc)[:-len(".model")]
            print(f"converting {fold_dir}/{name}.model ...")
            state_dict = load_reference_checkpoint(tc)
            fold = int(os.path.basename(fold_dir).split("_")[-1])
            trainer = trainer_cls(plans, fold,
                                  output_folder=os.path.dirname(model_folder),
                                  dataset_directory=None, stage=max(
                                      plans.plans_per_stage.keys()))
            trainer.log_nothing = True
            trainer.initialize(training=False)
            st = plans.stage(trainer.stage)
            num_pool = len(st.pool_op_kernel_sizes)
            converted = convert_generic_unet_state_dict(
                state_dict, num_pool=num_pool,
                conv_per_stage=plans.conv_per_stage)
            # sanity: shapes must match the freshly-initialized tree
            ref_flat = jax.tree_util.tree_flatten_with_path(trainer.state.params)[0]
            conv_flat = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
            for path, leaf in ref_flat:
                assert path in conv_flat, f"missing converted param {path}"
                assert conv_flat[path].shape == leaf.shape, \
                    f"shape mismatch at {path}: {conv_flat[path].shape} vs {leaf.shape}"
            tree = {"step": np.zeros((), np.int32), "params": converted}
            out = os.path.join(fold_dir, name + ".ckpt")
            with open(out, "wb") as f:
                f.write(serialization.to_bytes(tree))
            meta = trainer.checkpoint_metadata()
            meta["state_keys"] = sorted(tree.keys())
            meta["converted_from"] = tc
            with open(out + ".pkl", "wb") as f:
                pickle.dump(meta, f)
            print(f"  -> {out}")
