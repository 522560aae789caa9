"""The MultiTalent flagship trainers.

Parity target: custom_trainers/MultiTalent/MultiTalent/MultiTalent_Trainer_DDP.py:30-808
— 47 sigmoid region heads, the masked multi-head BCE + batch-dice loss with
cross-device statistics, order_seg=0 augmentation, inverse-sqrt dataset-balanced
sampling, the custom 12-fold split scheme, region-wise online evaluation, and
separate ce/dice component logging.

TPU-native shape: the reference needs a DDP process group plus an autograd
all_gather to pool batch-dice statistics across GPUs (compute_loss:598-605); here
the loss computes its reductions over the globally-sharded batch inside one jitted
SPMD step and XLA inserts the psum. The per-sample/per-valid-region Python loops
(:582-594) are a dense (48, 47) label->region matrix gather + a (B, 47) mask —
same math, MXU-shaped. The trainer is single- and multi-chip with no code change,
so the reference's `local_rank`/`distribute_batch_size` plumbing has no equivalent.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from multitalent_tpu import paths
from multitalent_tpu.utils.task_names import convert_id_to_task_name
from multitalent_tpu.data.loader import PatchSampler3D
from multitalent_tpu.registry import TRAINERS
from multitalent_tpu.tasks.multitalent import (NUM_REGIONS, REGIONS,
                                               build_custom_splits,
                                               inverse_sqrt_sampling_probabilities,
                                               label_region_matrix,
                                               valid_region_mask)
from multitalent_tpu.training.losses import multitalent_ds_loss
from multitalent_tpu.training.trainers import TrainerV2
from multitalent_tpu.utils.fileops import load_pickle, save_pickle


@TRAINERS.register(aliases=("MultiTalent_trainer_ddp",))
class MultiTalentTrainer(TrainerV2):
    def __init__(self, plans_file, fold, output_folder=None, dataset_directory=None,
                 batch_dice=True, stage=None, unpack_data=True, deterministic=True,
                 fp16=True, seed: int = 12345):
        super().__init__(plans_file, fold, output_folder, dataset_directory,
                         batch_dice=True, stage=stage, unpack_data=unpack_data,
                         deterministic=deterministic, fp16=fp16, seed=seed)
        self.regions = REGIONS
        self._label_region_matrix = label_region_matrix()  # (48, 47) static
        # per-iteration component logs (run_training:741-744 logs ce/dice separately)
        self.all_tr_ce: list[float] = []
        self.all_tr_dice: list[float] = []
        self.all_val_ce: list[float] = []
        self.all_val_dice: list[float] = []
        self._epoch_ce: list[float] = []
        self._epoch_dice: list[float] = []

    # ------------------------------------------------------------------- config
    def process_plans(self, plans) -> None:
        super().process_plans(plans)
        self.num_classes = NUM_REGIONS  # 47 region channels, no background channel

    def setup_DA_params(self) -> None:
        super().setup_DA_params()
        # nearest-neighbour seg warping: the GT label identities feed the region
        # matrix, so interpolation must not invent labels (order_seg=0, :102-110)
        self.data_aug_params["order_seg"] = 0

    def initialize_network(self) -> None:
        from multitalent_tpu.models.generic_unet import build_unet_from_plans
        self.network = build_unet_from_plans(
            self.plans, self.stage, deep_supervision=self.deep_supervision,
            dtype=jnp.bfloat16 if self.fp16 else jnp.float32,
            num_classes=NUM_REGIONS)
        self.inference_nonlin = "sigmoid"
        self.regions_class_order = list(range(self.num_classes))

    # ------------------------------------------------------------------- splits
    def do_split(self) -> None:
        """splits_custom.pkl handling (do_split:432-542): 5 stitched CV folds + 7
        leave-one-dataset-out folds. Building the file needs each source dataset's
        own splits_final.pkl under preprocessing_output_dir."""
        if self.fold == "all":
            tr_keys = val_keys = list(self.dataset.keys())
        else:
            splits_file = os.path.join(self.dataset_directory, "splits_custom.pkl")
            if not os.path.isfile(splits_file):
                self.print_to_log_file("Creating splits_custom.pkl (12 folds)...")
                keys = list(self.dataset.keys())
                per_task = {}
                for task_id in sorted({int(k.split("_")[0]) for k in keys}):
                    if task_id == 46:
                        continue
                    task_name = convert_id_to_task_name(task_id)
                    per_task[task_id] = load_pickle(os.path.join(
                        paths.preprocessing_output_dir(), task_name, "splits_final.pkl"))
                if any(k.startswith("046_") for k in keys) and 17 not in per_task:
                    per_task[17] = load_pickle(os.path.join(
                        paths.preprocessing_output_dir(),
                        convert_id_to_task_name(17), "splits_final.pkl"))
                save_pickle(build_custom_splits(keys, per_task), splits_file)
            splits = load_pickle(splits_file)
            tr_keys = splits[self.fold]["train"]
            val_keys = splits[self.fold]["val"]
        tr_keys = sorted(tr_keys)
        val_keys = sorted(val_keys)
        self.dataset_tr = {}
        for k in tr_keys:
            if k in self.dataset:
                self.dataset_tr[k] = self.dataset[k]
            else:
                self.print_to_log_file(
                    f"Warning {k} is not in preprocessed folder (might be intentional)")
        self.dataset_val = {}
        for k in val_keys:
            if k in self.dataset:
                self.dataset_val[k] = self.dataset[k]
            else:
                self.print_to_log_file(
                    f"Warning {k} is not in preprocessed folder (might be intentional)")

    # --------------------------------------------------------------- generators
    def get_basic_generators(self):
        """Dataset-balanced sampling: p(case) ~ 1/sqrt(dataset size)
        (get_basic_generators:625-661)."""
        self.load_dataset()
        self.do_split()
        assert self.threeD, "MultiTalent is 3D-only"
        probs_tr = inverse_sqrt_sampling_probabilities(sorted(self.dataset_tr.keys()))
        probs_val = inverse_sqrt_sampling_probabilities(sorted(self.dataset_val.keys()))
        self._log_dataset_probabilities(sorted(self.dataset_tr.keys()), probs_tr)

        def tr_factory(worker_id: int):
            return PatchSampler3D(
                self.dataset_tr, self.basic_generator_patch_size, self.patch_size,
                self.batch_size,
                oversample_foreground_percent=self.oversample_foreground_percent,
                pad_mode="constant", sampling_probabilities=probs_tr,
                seed=self.seed + worker_id)

        def val_factory(worker_id: int):
            return PatchSampler3D(
                self.dataset_val, self.patch_size, self.patch_size, self.batch_size,
                oversample_foreground_percent=self.oversample_foreground_percent,
                pad_mode="constant", sampling_probabilities=probs_val,
                seed=self.seed + 1000 + worker_id)

        return tr_factory, val_factory

    def _log_dataset_probabilities(self, keys, probs) -> None:
        prefixes = sorted({k.split("_")[0] for k in keys})
        counts = {p: sum(1 for k in keys if k.startswith(p + "_")) for p in prefixes}
        self.print_to_log_file("cases per dataset train:\n", list(counts.items()))
        self.print_to_log_file("probabilities per dataset:")
        for p in prefixes:
            idx = next(i for i, k in enumerate(keys) if k.startswith(p + "_"))
            self.print_to_log_file(p, probs[idx], probs[idx] * counts[p])

    # --------------------------------------------------------------------- loss
    def batch_extras(self, batch: dict) -> dict:
        mask = valid_region_mask([p["valid_regions"] for p in batch["properties"]])
        return {"valid_region_mask": mask}

    def loss_fn(self, outputs, targets, extras: dict):
        weights = [float(w) for w in self.ds_loss_weights]
        loss, ce, dc = multitalent_ds_loss(
            outputs, targets, extras["valid_region_mask"],
            jnp.asarray(self._label_region_matrix), weights, batch_dice=True)
        return loss, {"ce": ce, "dice": dc}

    def on_iteration_metrics(self, aux: dict, was_train: bool) -> None:
        self._epoch_ce.append(float(aux["ce"]))
        self._epoch_dice.append(float(aux["dice"]))

    # -------------------------------------------------------------- online eval
    def eval_stats(self, outputs, targets, extras):
        """Region-wise thresholded-sigmoid tp/fp/fn over valid regions only
        (run_online_evaluation:372-410), vectorized; (47,) per-channel sums over the
        global batch."""
        logits = outputs[0].astype(jnp.float32)
        y = targets[0].astype(jnp.int32)
        hard = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        gt = jnp.take(jnp.asarray(self._label_region_matrix), jnp.clip(y, 0), axis=0)
        vmask = extras["valid_region_mask"]
        vb = vmask.reshape((vmask.shape[0],) + (1,) * (logits.ndim - 2)
                           + (vmask.shape[-1],))
        axes = tuple(range(logits.ndim - 1))
        tp = jnp.sum(hard * gt * vb, axis=axes)
        fp = jnp.sum(hard * (1 - gt) * vb, axis=axes)
        fn = jnp.sum((1 - hard) * gt * vb, axis=axes)
        return tp, fp, fn

    def finish_online_evaluation(self) -> None:
        """Per-region global dice with eps-clipped denominator; channels never valid
        this epoch contribute 0 (finish_online_evaluation:412-431)."""
        if not self.online_eval_tp:
            return
        tp = np.sum(self.online_eval_tp, 0)
        fp = np.sum(self.online_eval_fp, 0)
        fn = np.sum(self.online_eval_fn, 0)
        dc_per_region = 2 * tp / np.clip(2 * tp + fp + fn, 1e-8, None)
        self.all_val_eval_metrics.append(float(np.mean(dc_per_region)))
        self.print_to_log_file("Average global foreground Dice:", str(list(dc_per_region)))
        self.print_to_log_file("(interpret this as an estimate for the Dice of the "
                               "different classes. This is not exact.)")
        self.online_eval_tp = []
        self.online_eval_fp = []
        self.online_eval_fn = []

    # ------------------------------------------------------------------ logging
    def run_training(self) -> None:
        self._epoch_ce, self._epoch_dice = [], []
        super().run_training()

    def on_epoch_end(self) -> bool:
        n_tr = self.num_batches_per_epoch
        if len(self._epoch_ce) >= n_tr:
            self.all_tr_ce.append(float(np.mean(self._epoch_ce[:n_tr])))
            self.all_tr_dice.append(float(np.mean(self._epoch_dice[:n_tr])))
            self.all_val_ce.append(float(np.mean(self._epoch_ce[n_tr:]))
                                   if len(self._epoch_ce) > n_tr else float("nan"))
            self.all_val_dice.append(float(np.mean(self._epoch_dice[n_tr:]))
                                     if len(self._epoch_dice) > n_tr else float("nan"))
            self.print_to_log_file(
                f"train ce : {self.all_tr_ce[-1]:.4f} train dice : {self.all_tr_dice[-1]:.4f}")
            self.print_to_log_file(
                f"val ce : {self.all_val_ce[-1]:.4f} val dice : {self.all_val_dice[-1]:.4f}")
        self._epoch_ce, self._epoch_dice = [], []
        return super().on_epoch_end()

    def validate(self, *args, **kwargs):
        from multitalent_tpu.inference.validation import run_multitalent_validation
        return run_multitalent_validation(self, *args, **kwargs)


@TRAINERS.register(aliases=("MultiTalent_trainer_ddp_2000ep",))
class MultiTalentTrainer2000ep(MultiTalentTrainer):
    """2000-epoch schedule of the released models (MultiTalent_Trainer_DDP.py:796-808)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_num_epochs = 2000


@TRAINERS.register(aliases=("MultiTalent_trainer_resenc_ddp",))
class MultiTalentTrainerResenc(MultiTalentTrainer):
    """MultiTalent over the FabiansUNet residual encoder
    (MultiTalent_meets_resenc.py:30-120): plans-driven block counts, pool kernels
    with a leading [1,1,1] stage, DS scales skipping that first entry, last-norm
    zero init (built into BasicResidualBlock)."""

    def setup_DA_params(self) -> None:
        super().setup_DA_params()
        from multitalent_tpu.augment.pipeline import ds_scales_from_pools
        self.deep_supervision_scales = ds_scales_from_pools(
            self.net_num_pool_op_kernel_sizes[1:])

    def initialize_network(self) -> None:
        from multitalent_tpu.models.residual_unet import build_resenc_unet_from_plans
        self.network = build_resenc_unet_from_plans(
            self.plans, self.stage, deep_supervision=self.deep_supervision,
            dtype=jnp.bfloat16 if self.fp16 else jnp.float32,
            num_classes=NUM_REGIONS)
        self.inference_nonlin = "sigmoid"
        self.regions_class_order = list(range(self.num_classes))


@TRAINERS.register(aliases=("MultiTalent_trainer_resenc_ddp_2000ep",))
class MultiTalentTrainerResenc2000ep(MultiTalentTrainerResenc):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_num_epochs = 2000


@TRAINERS.register(aliases=("Multitalent_mednextt", "MultiTalent_meets_mednext"))
class MultiTalentTrainerMedNeXt(MultiTalentTrainer):
    """MultiTalent over the MedNeXt backbone
    (competitions_with_custom_Trainers/.../MultiTalent_meets_mednext.py:51-120:
    n_channels 32, kernel 3, exp_r/block_counts [3,4,8,8,8,8,8,4,3], additive
    skips, 5 deep-supervision levels at dyadic scales)."""

    def setup_DA_params(self) -> None:
        super().setup_DA_params()
        from multitalent_tpu.augment.pipeline import ds_scales_from_pools
        # MedNeXt always downsamples 2x per level, 4 levels + bottleneck
        self.deep_supervision_scales = ds_scales_from_pools([[2, 2, 2]] * 5)

    def initialize_network(self) -> None:
        from multitalent_tpu.models.mednext import MedNeXt
        self.network = MedNeXt(
            in_channels=self.num_input_channels, n_channels=32,
            n_classes=NUM_REGIONS,
            dtype=jnp.bfloat16 if self.fp16 else jnp.float32)
        self.inference_nonlin = "sigmoid"
        self.regions_class_order = list(range(self.num_classes))


@TRAINERS.register(aliases=("MultiTalent_tainer_SwinUNETR_ddp_adam",
                            "MultiTalent_trainer_SwinUNETR_ddp_adam"))
class MultiTalentTrainerSwinUNETR(MultiTalentTrainer):
    """MultiTalent over SwinUNETR (MultiTalent_meets_swinunetr.py:33-120):
    feature_size 48, Adam 5e-4, NO deep supervision (do_ds=False)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.initial_lr = 5e-4
        self.deep_supervision = False

    def setup_DA_params(self) -> None:
        super().setup_DA_params()
        self.deep_supervision_scales = [[1.0, 1.0, 1.0]]

    def initialize(self, training: bool = True, force_load_plans: bool = False) -> None:
        super().initialize(training, force_load_plans)
        self.ds_loss_weights = np.array([1.0])

    def initialize_optimizer(self):
        from multitalent_tpu.training.schedules import make_poly_schedule
        from multitalent_tpu.training.train_state import make_adam_optimizer
        schedule = make_poly_schedule(self.initial_lr, self.max_num_epochs,
                                      self.num_batches_per_epoch)
        return make_adam_optimizer(schedule, weight_decay=self.weight_decay)

    def initialize_network(self) -> None:
        from multitalent_tpu.models.swin_unetr import SwinUNETR
        self.network = SwinUNETR(
            in_channels=self.num_input_channels, out_channels=NUM_REGIONS,
            feature_size=48,
            dtype=jnp.bfloat16 if self.fp16 else jnp.float32)
        self.inference_nonlin = "sigmoid"
        self.regions_class_order = list(range(self.num_classes))

    def _as_lists(self, outputs, targets):
        outputs = [outputs] if not isinstance(outputs, (list, tuple)) else outputs
        targets = [targets] if not isinstance(targets, (list, tuple)) else targets
        return outputs, targets

    def loss_fn(self, outputs, targets, extras):
        outputs, targets = self._as_lists(outputs, targets)
        return super().loss_fn(outputs, targets, extras)

    def eval_stats(self, outputs, targets, extras):
        outputs, targets = self._as_lists(outputs, targets)
        return super().eval_stats(outputs, targets, extras)
