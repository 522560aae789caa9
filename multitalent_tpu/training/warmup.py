"""Fine-tuning trainers: lr-warmup and seg-head-warmup schedules + pretrained
weight import.

Parity targets: nnUNet_variants/pretraining/nnUNetTrainerV2_warmup.py:38-198
(`nnUNetTrainerV2_warmup_increasing_lr`: 50-epoch linear lr ramp then polyLR;
`nnUNetTrainerV2_warmupsegheads`: 10 epochs AdamW 3e-3 on the segmentation heads
only, then re-initialized SGD over the whole network with the 50-epoch ramp,
phase-aware checkpoint resume) and run/load_pretrained_weights.py:17-61 (transfer
all matching backbone weights, never the seg heads).

TPU-native shape: the head-only phase is an optax.masked optimizer over the flax
param tree (paths containing 'seg'); the phase switch at epoch 10 swaps the
gradient transformation and re-initializes its state, keeping the step counter so
the step->epoch schedules stay aligned.
"""
from __future__ import annotations

import pickle

import jax
import numpy as np

from multitalent_tpu.registry import TRAINERS
from multitalent_tpu.training.schedules import (make_constant_schedule,
                                                make_warmup_poly_schedule, poly_lr)
from multitalent_tpu.training.train_state import (TrainState, make_adamw_optimizer,
                                                  make_masked_optimizer,
                                                  make_sgd_optimizer)
from multitalent_tpu.training.trainers import TrainerV2


def is_seg_head_param(path_str: str) -> bool:
    """Seg-head modules are named seg0..segN in GenericUNet."""
    return "seg" in path_str


def load_pretrained_weights(params, pretrained_params, exclude_seg_heads: bool = True,
                            verbose: bool = False):
    """Graft matching-shape leaves of `pretrained_params` onto `params`
    (load_pretrained_weights.py:17-61: only backbone keys transfer, shapes must
    match, seg heads are never transferred). Returns the merged tree."""
    flat_new = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_pre = dict(jax.tree_util.tree_flatten_with_path(pretrained_params)[0])
    merged = {}
    for path, leaf in flat_new.items():
        key = jax.tree_util.keystr(path)
        if path in flat_pre and flat_pre[path].shape == leaf.shape and not (
                exclude_seg_heads and is_seg_head_param(key)):
            merged[path] = flat_pre[path]
            if verbose:
                print("transferred:", key)
        else:
            merged[path] = leaf
            if verbose:
                print("kept random init:", key)
    treedef = jax.tree_util.tree_structure(params)
    order = jax.tree_util.tree_flatten_with_path(params)[0]
    return jax.tree_util.tree_unflatten(treedef, [merged[p] for p, _ in order])


@TRAINERS.register(aliases=("nnUNetTrainerV2_warmup_increasing_lr",))
class TrainerV2WarmupLR(TrainerV2):
    """Linear per-epoch lr ramp over the first 50 epochs, then polyLR
    (nnUNetTrainerV2_warmup.py:38-64)."""

    warmup_epochs = 50

    def initialize_optimizer(self):
        schedule = make_warmup_poly_schedule(
            self.initial_lr, self.max_num_epochs, self.num_batches_per_epoch,
            warmup_epochs=self.warmup_epochs)
        return make_sgd_optimizer(schedule, momentum=0.99, nesterov=True,
                                  weight_decay=self.weight_decay, clip_norm=12.0)

    def current_lr(self) -> float:
        e = min(self.epoch, self.max_num_epochs - 1)
        if e < self.warmup_epochs:
            return float(self.initial_lr * (e + 1) / self.warmup_epochs)
        return float(poly_lr(e, self.max_num_epochs, self.initial_lr))


@TRAINERS.register(aliases=("nnUNetTrainerV2_warmupsegheads",))
class TrainerV2WarmupSegHeads(TrainerV2WarmupLR):
    """Phase 1 (epochs 0-9): AdamW lr 3e-3, segmentation heads only.
    Phase 2 (epoch 10+): SGD over everything with the 50-epoch ramp schedule
    (nnUNetTrainerV2_warmup.py:67-198)."""

    head_warmup_epochs = 10
    head_lr = 3e-3

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.optimizer_phase = 1
        self.pretrained_params_file: str | None = None

    def initialize_optimizer(self):
        if self.optimizer_phase == 1:
            inner = make_adamw_optimizer(make_constant_schedule(self.head_lr),
                                         weight_decay=self.weight_decay)
            return make_masked_optimizer(
                inner, lambda path, _leaf: is_seg_head_param(path))
        return super().initialize_optimizer()

    def _switch_to_phase2(self) -> None:
        """Re-initialize the optimizer for whole-network SGD, keeping params and the
        step counter (the reference re-creates torch's optimizer at epoch 10,
        nnUNetTrainerV2_warmup.py:111-117)."""
        self.optimizer_phase = 2
        tx = self.initialize_optimizer()
        self.state = TrainState(step=self.state.step, params=self.state.params,
                                opt_state=tx.init(self.state.params), tx=tx,
                                apply_fn=self.state.apply_fn)
        self._build_step_functions()  # re-jit: the step closes over state.tx
        self.print_to_log_file("head warmup done: switched to SGD on all parameters")

    def on_epoch_end(self) -> bool:
        cont = super().on_epoch_end()
        if self.optimizer_phase == 1 and self.epoch + 1 >= self.head_warmup_epochs:
            self._switch_to_phase2()
        return cont

    def checkpoint_metadata(self) -> dict:
        meta = super().checkpoint_metadata()
        meta["optimizer_phase"] = self.optimizer_phase
        return meta

    def load_checkpoint(self, fname: str, train: bool = True) -> None:
        """Phase-aware resume: the optax state template must match the phase the
        checkpoint was saved in (nnUNetTrainerV2_warmup.py:132-198)."""
        with open(fname + ".pkl", "rb") as f:
            meta = pickle.load(f)
        if not self.initialized:
            self.initialize(train)
        if meta.get("optimizer_phase", 1) == 2 and self.optimizer_phase == 1:
            self._switch_to_phase2()
        super().load_checkpoint(fname, train)

    def maybe_load_pretrained_weights(self, pretrained_params) -> None:
        self.state = self.state.replace(params=load_pretrained_weights(
            self.state.params, pretrained_params))
        self.print_to_log_file("loaded pretrained backbone weights")


TRAINERS.register(aliases=("nnUNetTrainerV2_warmup",))(TrainerV2WarmupLR)


@TRAINERS.register(aliases=("nnUNetTrainerV2_warmupsegheads_resenc",))
class TrainerV2WarmupSegHeadsResenc(TrainerV2WarmupSegHeads):
    """Head-warmup schedule over the residual-encoder UNet
    (nnUNetTrainerV2_warmup.py:441-...)."""

    def setup_DA_params(self) -> None:
        from multitalent_tpu.training.trainers import TrainerV2ResencUNet
        TrainerV2ResencUNet.setup_DA_params(self)

    def initialize_network(self) -> None:
        from multitalent_tpu.training.trainers import TrainerV2ResencUNet
        TrainerV2ResencUNet.initialize_network(self)


@TRAINERS.register(aliases=("nnUNetTrainerV2_warmupsegheads_swinunetr_adam_lr5e4_ddp",))
class TrainerV2WarmupSegHeadsSwin(TrainerV2WarmupSegHeads):
    """Head-warmup over SwinUNETR with Adam 5e-4 in phase 2
    (nnUNetTrainerV2_warmup.py swinunetr variant)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.initial_lr = 5e-4
        self.deep_supervision = False

    def setup_DA_params(self) -> None:
        super().setup_DA_params()
        self.deep_supervision_scales = [[1.0, 1.0, 1.0]]

    def initialize(self, training: bool = True, force_load_plans: bool = False) -> None:
        super().initialize(training, force_load_plans)
        import numpy as _np
        self.ds_loss_weights = _np.array([1.0])

    def initialize_network(self) -> None:
        from multitalent_tpu.training.variants import TrainerV2SwinUNETR
        TrainerV2SwinUNETR.initialize_network(self)

    def initialize_optimizer(self):
        if self.optimizer_phase == 1:
            return super().initialize_optimizer()
        from multitalent_tpu.training.schedules import make_poly_schedule
        from multitalent_tpu.training.train_state import make_adam_optimizer
        return make_adam_optimizer(
            make_poly_schedule(self.initial_lr, self.max_num_epochs,
                               self.num_batches_per_epoch),
            weight_decay=self.weight_decay)

    def loss_fn(self, outputs, targets, extras):
        from multitalent_tpu.training.variants import TrainerV2SwinUNETR
        return TrainerV2SwinUNETR.loss_fn(self, outputs, targets, extras)

    def eval_stats(self, outputs, targets, extras):
        from multitalent_tpu.training.variants import TrainerV2SwinUNETR
        return TrainerV2SwinUNETR.eval_stats(self, outputs, targets, extras)
