"""Checkpoint -> trainer restoration.

Parity target: nnunet/training/model_restore.py:44-148. Checkpoints are
self-describing: the sidecar `<ckpt>.pkl` stores the trainer class name and its
init args (written by NetworkTrainerBase.checkpoint_metadata), so `restore_model`
can re-instantiate the exact trainer. Instead of the reference's reflective module
walking (`recursive_find_python_class`), names resolve through the explicit
trainer registry (multitalent_tpu/registry.py).
"""
from __future__ import annotations

import os

from multitalent_tpu.registry import resolve_trainer
from multitalent_tpu.utils.fileops import load_pickle, subdirs


def restore_model(pkl_file: str, checkpoint: str | None = None, train: bool = False):
    """Instantiate the trainer stored in `pkl_file` (a `<ckpt>.pkl` sidecar) and
    optionally load the checkpoint weights."""
    info = load_pickle(pkl_file)
    init_args = info["init_args"]
    trainer_class = None
    for name in [info["trainer_name"]] + list(info.get("trainer_bases", [])):
        try:
            trainer_class = resolve_trainer(name)
            break
        except KeyError:
            continue
    if trainer_class is None:
        raise KeyError(f"cannot resolve trainer {info['trainer_name']!r} "
                       f"(bases: {info.get('trainer_bases')})")
    trainer = trainer_class(*init_args)
    # the stored output_folder already includes fold_X; the constructor appends it
    # again, so restore the recorded folder verbatim
    trainer.output_folder = os.path.dirname(pkl_file)
    if checkpoint is not None:
        trainer.load_checkpoint(checkpoint, train=train)
    else:
        trainer.initialize(train)
    return trainer


def load_model_and_checkpoint_files(model_folder: str, folds=None,
                                    checkpoint_name: str = "model_final_checkpoint"):
    """Load the trainer plus every requested fold's parameter tree into host RAM for
    fast fold-ensemble switching (model_restore.py:109-148). Returns
    (trainer, [state_tree_per_fold])."""
    import jax
    from flax import serialization

    if isinstance(folds, str):
        folds = [folds]
    if folds is None:
        fold_dirs = subdirs(model_folder, prefix="fold_", join=False)
        folds = sorted(int(f.split("_")[-1]) for f in fold_dirs)
    fold_folders = [os.path.join(model_folder, f"fold_{f}") if f != "all"
                    else os.path.join(model_folder, "all") for f in folds]
    ckpts = [os.path.join(f, checkpoint_name + ".ckpt") for f in fold_folders]
    assert all(os.path.isfile(c) for c in ckpts), \
        f"missing checkpoints: {[c for c in ckpts if not os.path.isfile(c)]}"

    trainer = restore_model(ckpts[0] + ".pkl", checkpoint=None, train=False)
    all_params = []
    template = jax.device_get(trainer.state.params)
    for c in ckpts:
        meta = load_pickle(c + ".pkl")
        tree_template = {"step": jax.device_get(trainer.state.step),
                         "params": template}
        if "opt_state" in meta.get("state_keys", ()):
            tree_template["opt_state"] = jax.device_get(trainer.state.opt_state)
        with open(c, "rb") as f:
            tree = serialization.from_bytes(tree_template, f.read())
        all_params.append(tree["params"])
    return trainer, all_params
