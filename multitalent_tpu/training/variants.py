"""Trainer variant zoo: loss / optimizer / augmentation / supervision ablations.

Parity target: the nnUNet_variants tree (~70 subclasses,
nnunet/training/network_training/nnUNet_variants/). Behavior variants are trainer
subclasses, exactly like the reference — the class IS the config. This module
covers the variants that change training math; purely-architectural norm/nonlin
swaps (BN/GN/FRN/GeLU/Mish) are represented by `TrainerV2_ReLU`-style subclasses
only where the flax blocks support the swap.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from multitalent_tpu.registry import TRAINERS
from multitalent_tpu.training import losses as L
from multitalent_tpu.training.losses import deep_supervision_loss
from multitalent_tpu.training.schedules import make_constant_schedule
from multitalent_tpu.training.train_state import make_adam_optimizer
from multitalent_tpu.training.trainers import TrainerV2


# ------------------------------------------------------------------ loss variants
@TRAINERS.register(aliases=("nnUNetTrainerV2_Loss_CE",))
class TrainerV2LossCE(TrainerV2):
    """Cross-entropy only (loss_variants/nnUNetTrainerV2_Loss_CE.py)."""

    def loss_fn(self, outputs, targets, extras):
        weights = [float(w) for w in self.ds_loss_weights]
        return deep_supervision_loss(outputs, targets, L.robust_cross_entropy,
                                     weights), {}


@TRAINERS.register(aliases=("nnUNetTrainerV2_Loss_Dice",))
class TrainerV2LossDice(TrainerV2):
    """Soft dice only (loss_variants/nnUNetTrainerV2_Loss_Dice.py)."""

    def loss_fn(self, outputs, targets, extras):
        weights = [float(w) for w in self.ds_loss_weights]
        fn = partial(L.soft_dice_loss, batch_dice=self.batch_dice, do_bg=False)
        return deep_supervision_loss(outputs, targets, fn, weights), {}


@TRAINERS.register(aliases=("nnUNetTrainerV2_Loss_DicewithBG",))
class TrainerV2LossDiceBG(TrainerV2):
    def loss_fn(self, outputs, targets, extras):
        weights = [float(w) for w in self.ds_loss_weights]
        fn = partial(L.soft_dice_loss, batch_dice=self.batch_dice, do_bg=True)
        return deep_supervision_loss(outputs, targets, fn, weights), {}


@TRAINERS.register(aliases=("nnUNetTrainerV2_Loss_CEandTopK10", "nnUNetTrainerV2_Loss_TopK10"))
class TrainerV2LossTopK(TrainerV2):
    """Dice + TopK-10% CE (loss_variants ...TopK10)."""

    def loss_fn(self, outputs, targets, extras):
        weights = [float(w) for w in self.ds_loss_weights]

        def fn(o, t):
            dc = L.soft_dice_loss(o, t, batch_dice=self.batch_dice, do_bg=False)
            return dc + L.topk_cross_entropy(o, t, k_percent=10.0)

        return deep_supervision_loss(outputs, targets, fn, weights), {}


@TRAINERS.register(aliases=("nnUNetTrainerV2_focalLoss",))
class TrainerV2FocalLoss(TrainerV2):
    def loss_fn(self, outputs, targets, extras):
        weights = [float(w) for w in self.ds_loss_weights]

        def fn(o, t):
            dc = L.soft_dice_loss(o, t, batch_dice=self.batch_dice, do_bg=False)
            return dc + L.focal_ce_loss(o, t)

        return deep_supervision_loss(outputs, targets, fn, weights), {}


@TRAINERS.register(aliases=("nnUNetTrainerV2_GDL",))
class TrainerV2GDL(TrainerV2):
    def loss_fn(self, outputs, targets, extras):
        weights = [float(w) for w in self.ds_loss_weights]

        def fn(o, t):
            return L.gdl_loss(o, t) + L.robust_cross_entropy(o, t)

        return deep_supervision_loss(outputs, targets, fn, weights), {}


# ------------------------------------------------------------- optimizer variants
@TRAINERS.register(aliases=("nnUNetTrainerV2_Adam",))
class TrainerV2Adam(TrainerV2):
    """Adam 3e-4 instead of SGD (optimizer_and_lr/nnUNetTrainerV2_Adam.py)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.initial_lr = 3e-4

    def initialize_optimizer(self):
        from multitalent_tpu.training.schedules import make_poly_schedule
        schedule = make_poly_schedule(self.initial_lr, self.max_num_epochs,
                                      self.num_batches_per_epoch)
        return make_adam_optimizer(schedule, weight_decay=self.weight_decay)


@TRAINERS.register(aliases=("nnUNetTrainerV2_SGD_fixedSchedule",
                            "nnUNetTrainerV2_constLR"))
class TrainerV2ConstLR(TrainerV2):
    def initialize_optimizer(self):
        from multitalent_tpu.training.train_state import make_sgd_optimizer
        return make_sgd_optimizer(make_constant_schedule(self.initial_lr),
                                  weight_decay=self.weight_decay)

    def current_lr(self) -> float:
        return float(self.initial_lr)


@TRAINERS.register(aliases=("nnUNetTrainerV2_momentum09",))
class TrainerV2Momentum09(TrainerV2):
    def initialize_optimizer(self):
        from multitalent_tpu.training.schedules import make_poly_schedule
        from multitalent_tpu.training.train_state import make_sgd_optimizer
        schedule = make_poly_schedule(self.initial_lr, self.max_num_epochs,
                                      self.num_batches_per_epoch)
        return make_sgd_optimizer(schedule, momentum=0.9,
                                  weight_decay=self.weight_decay)


# ----------------------------------------------------------------- DA variants
@TRAINERS.register(aliases=("nnUNetTrainerV2_noDataAugmentation", "nnUNetTrainerV2_noDA"))
class TrainerV2NoDA(TrainerV2):
    """No augmentation: patches pass through with center crop only
    (data_augmentation/nnUNetTrainerV2_noDataAugmentation.py)."""

    def setup_DA_params(self) -> None:
        super().setup_DA_params()
        p = self.data_aug_params
        p["do_rotation"] = False
        p["p_rot"] = 0.0
        p["do_scaling"] = False
        p["p_scale"] = 0.0
        p["do_mirror"] = False
        p["do_gamma"] = False
        for key in ("p_gaussian_noise", "p_gaussian_blur", "p_brightness_mult",
                    "p_contrast", "p_lowres", "p_gamma", "p_gamma_invert"):
            p[key] = 0.0
        # sample at the final patch size: no rotation headroom needed
        self.basic_generator_patch_size = np.array(self.patch_size, dtype=int)


@TRAINERS.register(aliases=("nnUNetTrainerV2_noMirroring",))
class TrainerV2NoMirroring(TrainerV2):
    def setup_DA_params(self) -> None:
        super().setup_DA_params()
        self.data_aug_params["do_mirror"] = False


@TRAINERS.register(aliases=("nnUNetTrainerV2_insaneDA",))
class TrainerV2InsaneDA(TrainerV2):
    """Stronger augmentation (data_augmentation/nnUNetTrainerV2_insaneDA.py:
    wider rotations/scaling, more aggressive intensity probabilities)."""

    def setup_DA_params(self) -> None:
        super().setup_DA_params()
        p = self.data_aug_params
        p["p_rot"] = 0.7
        p["scale_range"] = (0.65, 1.6)
        p["p_scale"] = 0.65
        p["p_gamma"] = 0.5
        p["p_gaussian_noise"] = 0.15
        from multitalent_tpu.augment.params import get_patch_size
        self.basic_generator_patch_size = get_patch_size(
            self.patch_size, p["rotation_x"], p["rotation_y"], p["rotation_z"],
            p["scale_range"])


@TRAINERS.register(aliases=("nnUNetTrainerV2_DA5", "nnUNetTrainerV2_DA3"))
class TrainerV2DA5(TrainerV2InsaneDA):
    """DA5-style heavier augmentation preset (nnUNetTrainerV2_DA5.py role; the
    reference's extra transform set maps onto higher probabilities of the fused
    on-device chain)."""

    def setup_DA_params(self) -> None:
        super().setup_DA_params()
        p = self.data_aug_params
        p["p_gaussian_blur"] = 0.3
        p["p_brightness_mult"] = 0.3
        p["p_contrast"] = 0.3
        p["p_lowres"] = 0.35


# ------------------------------------------------------- supervision / misc
@TRAINERS.register(aliases=("nnUNetTrainerV2_noDeepSupervision",))
class TrainerV2NoDeepSupervision(TrainerV2):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.deep_supervision = False

    def initialize(self, training: bool = True, force_load_plans: bool = False) -> None:
        super().initialize(training, force_load_plans)
        self.ds_loss_weights = np.array([1.0])

    def setup_DA_params(self) -> None:
        super().setup_DA_params()
        self.deep_supervision_scales = [[1.0, 1.0, 1.0]]

    def loss_fn(self, outputs, targets, extras):
        from multitalent_tpu.training.losses import dc_and_ce_loss
        out = outputs if not isinstance(outputs, (list, tuple)) else outputs[0]
        tgt = targets if not isinstance(targets, (list, tuple)) else targets[0]
        return dc_and_ce_loss(out, tgt, batch_dice=self.batch_dice), {}

    def eval_stats(self, outputs, targets, extras):
        outputs = [outputs] if not isinstance(outputs, (list, tuple)) else outputs
        targets = [targets] if not isinstance(targets, (list, tuple)) else targets
        return super().eval_stats(outputs, targets, extras)


@TRAINERS.register(aliases=("nnUNetTrainerV2_fp32",))
class TrainerV2FP32(TrainerV2):
    def __init__(self, plans_file, fold, output_folder=None,
                 dataset_directory=None, batch_dice=True, stage=None,
                 unpack_data=True, deterministic=True, fp16=True, seed=12345):
        super().__init__(plans_file, fold, output_folder, dataset_directory,
                         batch_dice, stage, unpack_data, deterministic,
                         fp16=False, seed=seed)
