"""Trainer variant zoo: loss / optimizer / augmentation / supervision ablations.

Parity target: the nnUNet_variants tree (~70 subclasses,
nnunet/training/network_training/nnUNet_variants/). Behavior variants are trainer
subclasses, exactly like the reference — the class IS the config. Covers loss,
optimizer, augmentation, supervision and architectural (BN/GN/FRN/none norm,
ReLU/GeLU/Mish/LeakyReLU-slope nonlins, 3ConvPerStage, allConv3x3, seg-head bias)
ablations via TrainerV2.network_overrides.
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


@TRAINERS.register(aliases=("nnUNetTrainerV2_ResencUNet_DA3",))
class TrainerV2ResencUNetDA3(TrainerV2DA5):
    """Residual-encoder network under the DA3 augmentation preset
    (architectural_variants/nnUNetTrainerV2_ResencUNet_DA3.py:27)."""

    def setup_DA_params(self) -> None:
        from multitalent_tpu.augment.pipeline import ds_scales_from_pools
        super().setup_DA_params()
        self.deep_supervision_scales = ds_scales_from_pools(
            self.net_num_pool_op_kernel_sizes[1:])

    def initialize_network(self) -> None:
        from multitalent_tpu.models.residual_unet import build_resenc_unet_from_plans
        self.network = build_resenc_unet_from_plans(
            self.plans, self.stage, deep_supervision=self.deep_supervision,
            dtype=jnp.bfloat16 if self.fp16 else jnp.float32,
            num_classes=self.num_classes)


# ------------------------------------------------------- architectural variants
# (nnUNet_variants/architectural_variants/ — norm/nonlin/conv-count swaps expressed
# through TrainerV2.network_overrides instead of re-calling the constructor)
@TRAINERS.register(aliases=("nnUNetTrainerV2_BN",))
class TrainerV2BN(TrainerV2):
    """BatchNorm instead of InstanceNorm (nnUNetTrainerV2_BN.py:22)."""

    def network_overrides(self) -> dict:
        return {"norm": "batch"}


@TRAINERS.register(aliases=("nnUNetTrainerV2_GN",))
class TrainerV2GN(TrainerV2):
    """GroupNorm(8 groups) (nnUNetTrainerV2_GN.py:23,39)."""

    def network_overrides(self) -> dict:
        return {"norm": "group"}


@TRAINERS.register(aliases=("nnUNetTrainerV2_FRN",))
class TrainerV2FRN(TrainerV2):
    """Filter-response norm + TLU, which subsumes the nonlinearity
    (nnUNetTrainerV2_FRN.py:26; feature_response_normalization.py:23)."""

    def network_overrides(self) -> dict:
        return {"norm": "frn"}


@TRAINERS.register(aliases=("nnUNetTrainerV2_NoNormalization",))
class TrainerV2NoNorm(TrainerV2):
    """conv->nonlin with no norm (nnUNetTrainerV2_NoNormalization.py:23)."""

    def network_overrides(self) -> dict:
        return {"norm": "none"}


@TRAINERS.register(aliases=("nnUNetTrainerV2_NoNormalization_lr1en3",))
class TrainerV2NoNormLR1en3(TrainerV2NoNorm):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.initial_lr = 1e-3


@TRAINERS.register(aliases=("nnUNetTrainerV2_ReLU",))
class TrainerV2ReLU(TrainerV2):
    def network_overrides(self) -> dict:
        return {"nonlin": "relu"}


@TRAINERS.register(aliases=("nnUNetTrainerV2_GeLU",))
class TrainerV2GeLU(TrainerV2):
    def network_overrides(self) -> dict:
        return {"nonlin": "gelu"}


@TRAINERS.register(aliases=("nnUNetTrainerV2_Mish",))
class TrainerV2Mish(TrainerV2):
    def network_overrides(self) -> dict:
        return {"nonlin": "mish"}


@TRAINERS.register(aliases=("nnUNetTrainerV2_LReLU_slope_2en1",))
class TrainerV2LReLUSlope2en1(TrainerV2):
    """LeakyReLU negative_slope 0.2 (nnUNetTrainerV2_LReLU_slope_2en1.py:22)."""

    def network_overrides(self) -> dict:
        return {"negative_slope": 2e-1}


@TRAINERS.register(aliases=("nnUNetTrainerV2_ReLU_biasInSegOutput",))
class TrainerV2ReLUBiasInSegOutput(TrainerV2):
    def network_overrides(self) -> dict:
        return {"nonlin": "relu", "seg_output_bias": True}


@TRAINERS.register(aliases=("nnUNetTrainerV2_lReLU_biasInSegOutput",))
class TrainerV2LReLUBiasInSegOutput(TrainerV2):
    def network_overrides(self) -> dict:
        return {"seg_output_bias": True}


@TRAINERS.register(aliases=("nnUNetTrainerV2_3ConvPerStage",))
class TrainerV2_3ConvPerStage(TrainerV2):
    """3 convs per stage at base 24 features (nnUNetTrainerV2_3ConvPerStage.py:22-25)."""

    def network_overrides(self) -> dict:
        return {"conv_per_stage": 3, "base_num_features": 24}


@TRAINERS.register(aliases=("nnUNetTrainerV2_3ConvPerStageSameFilters",))
class TrainerV2_3ConvPerStageSameFilters(TrainerV2):
    """3 convs per stage keeping the plan's base features
    (nnUNetTrainerV2_3ConvPerStage_samefilters.py:22)."""

    def network_overrides(self) -> dict:
        return {"conv_per_stage": 3}


@TRAINERS.register(aliases=("nnUNetTrainerV2_allConv3x3",))
class TrainerV2AllConv3x3(TrainerV2):
    """Force every conv kernel to 3^d, overriding the plan's anisotropic 1x3x3
    stages (nnUNetTrainerV2_allConv3x3.py:22)."""

    def network_overrides(self) -> dict:
        st = self.plans.stage(self.stage)
        dim = len(st.patch_size)
        n = len(st.conv_kernel_sizes)
        return {"conv_kernel_sizes": ((3,) * dim,) * n}


@TRAINERS.register(aliases=("nnUNetTrainerV2_fp32",))
class TrainerV2FP32(TrainerV2):
    def __init__(self, plans_file, fold, output_folder=None,
                 dataset_directory=None, batch_dice=True, stage=None,
                 unpack_data=True, deterministic=True, fp16=True, seed=12345):
        super().__init__(plans_file, fold, output_folder, dataset_directory,
                         batch_dice, stage, unpack_data, deterministic,
                         fp16=False, seed=seed)


@TRAINERS.register(aliases=("nnUNetTrainerV2_Loss_MCC",))
class TrainerV2LossMCC(TrainerV2):
    """Matthews-correlation loss + CE (loss_functions ...MCC.py analog,
    TopK_loss.py:198)."""

    def loss_fn(self, outputs, targets, extras):
        weights = [float(w) for w in self.ds_loss_weights]

        def fn(o, t):
            return L.mcc_loss(o, t) + L.robust_cross_entropy(o, t)

        return deep_supervision_loss(outputs, targets, fn, weights), {}


@TRAINERS.register(aliases=("nnUNetTrainerV2_Loss_DC_CE_squared",
                            "nnUNetTrainerV2_SquaredDiceCE"))
class TrainerV2LossSquaredDice(TrainerV2):
    """Squared-denominator Dice + CE (dice_loss.py:245 SoftDiceLossSquared)."""

    def loss_fn(self, outputs, targets, extras):
        weights = [float(w) for w in self.ds_loss_weights]

        def fn(o, t):
            dc = L.squared_dice_loss(o, t, batch_dice=self.batch_dice,
                                     do_bg=False)
            return dc + L.robust_cross_entropy(o, t)

        return deep_supervision_loss(outputs, targets, fn, weights), {}


@TRAINERS.register(aliases=("nnUNetTrainerV2_momentum095",))
class TrainerV2Momentum095(TrainerV2):
    def initialize_optimizer(self):
        from multitalent_tpu.training.schedules import make_poly_schedule
        from multitalent_tpu.training.train_state import make_sgd_optimizer
        schedule = make_poly_schedule(self.initial_lr, self.max_num_epochs,
                                      self.num_batches_per_epoch)
        return make_sgd_optimizer(schedule, momentum=0.95,
                                  weight_decay=self.weight_decay)


@TRAINERS.register(aliases=("nnUNetTrainerV2_momentum098",))
class TrainerV2Momentum098(TrainerV2):
    def initialize_optimizer(self):
        from multitalent_tpu.training.schedules import make_poly_schedule
        from multitalent_tpu.training.train_state import make_sgd_optimizer
        schedule = make_poly_schedule(self.initial_lr, self.max_num_epochs,
                                      self.num_batches_per_epoch)
        return make_sgd_optimizer(schedule, momentum=0.98,
                                  weight_decay=self.weight_decay)


@TRAINERS.register(aliases=("nnUNetTrainerV2_Ranger_lr3en4",
                            "nnUNetTrainerV2_Ranger"))
class TrainerV2Ranger(TrainerV2):
    """Ranger = RAdam + Lookahead at lr 3e-4
    (optimizer_and_lr/nnUNetTrainerV2_Ranger_lr3en4.py), built from optax
    primitives instead of the torch-optimizer package."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.initial_lr = 3e-4

    def initialize_optimizer(self):
        import optax
        from multitalent_tpu.training.schedules import make_poly_schedule
        schedule = make_poly_schedule(self.initial_lr, self.max_num_epochs,
                                      self.num_batches_per_epoch)
        # Deviation: Lookahead's slow-weight copy is omitted (optax.lookahead
        # changes the param pytree shape, which would leak into every
        # checkpoint/inference path for a minor ablation trainer); RAdam
        # carries the variant's substance (rectified warmup-free adaptivity).
        return optax.chain(
            optax.add_decayed_weights(self.weight_decay),
            optax.scale_by_radam(),
            optax.scale_by_learning_rate(schedule),
        )


@TRAINERS.register(aliases=("nnUNetTrainerV2_cycleAtEnd",))
class TrainerV2CycleAtEnd(TrainerV2):
    """polyLR for the normal schedule, then one cosine lr cycle over the final
    100 epochs peaking back at the initial lr
    (optimizer_and_lr/nnUNetTrainerV2_cycleAtEnd.py:21-39)."""

    cycle_epochs = 100

    def initialize_optimizer(self):
        import optax
        from multitalent_tpu.training.schedules import make_poly_schedule
        from multitalent_tpu.training.train_state import make_sgd_optimizer
        ipe = self.num_batches_per_epoch
        main_epochs = max(self.max_num_epochs - self.cycle_epochs, 1)
        poly = make_poly_schedule(self.initial_lr, main_epochs, ipe)
        cycle = optax.cosine_onecycle_schedule(
            transition_steps=self.cycle_epochs * ipe,
            peak_value=self.initial_lr)
        schedule = optax.join_schedules([poly, cycle], [main_epochs * ipe])
        return make_sgd_optimizer(schedule, weight_decay=self.weight_decay)
