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
@TRAINERS.register(aliases=("nnUNetTrainerV2_Loss_CE", "nnUNetTrainerCE"))
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


@TRAINERS.register(aliases=("nnUNetTrainerV2_Loss_TopK10",))
class TrainerV2LossTopKOnly(TrainerV2):
    """TopK-10% CE only (loss_function/nnUNetTrainerV2_Loss_TopK10.py)."""

    def loss_fn(self, outputs, targets, extras):
        weights = [float(w) for w in self.ds_loss_weights]
        return deep_supervision_loss(
            outputs, targets, partial(L.topk_cross_entropy, k_percent=10.0),
            weights), {}


@TRAINERS.register(aliases=("nnUNetTrainerV2_Loss_CEandTopK10",
                            "nnUNetTrainerV2_Loss_DiceTopK10"))
class TrainerV2LossTopK(TrainerV2):
    """Dice + TopK-10% CE (loss_function/nnUNetTrainerV2_Loss_DiceTopK10.py)."""

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
@TRAINERS.register(aliases=("nnUNetTrainerV2_noDataAugmentation", "nnUNetTrainerV2_noDA", "nnUNetTrainerNoDA"))
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


# ---------------------------------------------------------------- lr-value ablations
def _lr_variant(name: str, aliases: tuple[str, ...], lr: float, base=TrainerV2):
    """SGD-at-fixed-initial-lr family (optimizer_and_lr/nnUNetTrainerV2_SGD_lr*.py
    and loss_function/*_LR1en3.py): only initial_lr differs."""

    class _T(base):
        def __init__(self, *args, **kwargs):
            super().__init__(*args, **kwargs)
            self.initial_lr = lr

    _T.__name__ = name
    return TRAINERS.register(aliases=aliases)(_T)


TrainerV2SGDlr1en1 = _lr_variant("TrainerV2SGDlr1en1",
                                 ("nnUNetTrainerV2_SGD_lr1en1",), 1e-1)
TrainerV2SGDlr1en3 = _lr_variant("TrainerV2SGDlr1en3",
                                 ("nnUNetTrainerV2_SGD_lr1en3",), 1e-3)
TrainerV2LossDiceLR1en3 = _lr_variant(
    "TrainerV2LossDiceLR1en3", ("nnUNetTrainerV2_Loss_Dice_LR1en3",), 1e-3,
    base=TrainerV2LossDice)
TrainerV2LossDiceBGLR1en3 = _lr_variant(
    "TrainerV2LossDiceBGLR1en3", ("nnUNetTrainerV2_Loss_DicewithBG_LR1en3",),
    1e-3, base=TrainerV2LossDiceBG)
TrainerV2Rangerlr1en2 = _lr_variant("TrainerV2Rangerlr1en2",
                                    ("nnUNetTrainerV2_Ranger_lr1en2",), 1e-2,
                                    base=TrainerV2Ranger)
TrainerV2Rangerlr3en3 = _lr_variant("TrainerV2Rangerlr3en3",
                                    ("nnUNetTrainerV2_Ranger_lr3en3",), 3e-3,
                                    base=TrainerV2Ranger)


@TRAINERS.register(aliases=("nnUNetTrainerV2_Adam_nnUNetTrainerlr",))
class TrainerV2AdamTrainerLR(TrainerV2Adam):
    """Adam at nnUNetTrainer's 3e-4 (optimizer_and_lr/nnUNetTrainerV2_Adam_lr_3en4)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.initial_lr = 3e-4


# ------------------------------------------------------- ReduceLROnPlateau variants
class _PlateauMixin:
    """lr *= 0.2 when the train-loss moving average stops improving (the
    nnUNetTrainer ReduceLROnPlateau regime: patience 30, eps 1e-3 —
    nnUNetTrainer.py:265-272), expressed as an explicit per-epoch rule; the
    optimizer consumes `self._plateau_lr` via a constant schedule."""

    lr_patience = 30
    lr_threshold = 1e-3

    def initialize_optimizer(self):
        self._plateau_lr = float(self.initial_lr)
        self._best_ma = None
        self._worse_epochs = 0
        return self._make_plateau_optimizer()

    def maybe_update_lr(self) -> None:
        ma = self.train_loss_MA
        if ma is None:
            return
        if self._best_ma is None or ma < self._best_ma - self.lr_threshold:
            self._best_ma = ma
            self._worse_epochs = 0
        else:
            self._worse_epochs += 1
        if self._worse_epochs > self.lr_patience:
            self._plateau_lr = max(self._plateau_lr * 0.2, 1e-6)
            self._worse_epochs = 0
            self.print_to_log_file(f"plateau: reducing lr to {self._plateau_lr}")
            # swap the optimizer's schedule in place; momentum state persists
            self.state = self.state.replace(tx=self._make_plateau_optimizer())

    def current_lr(self) -> float:
        return self._plateau_lr


@TRAINERS.register(aliases=("nnUNetTrainerV2_SGD_ReduceOnPlateau",))
class TrainerV2SGDPlateau(_PlateauMixin, TrainerV2):
    def _make_plateau_optimizer(self):
        from multitalent_tpu.training.train_state import make_sgd_optimizer
        return make_sgd_optimizer(make_constant_schedule(self._plateau_lr),
                                  weight_decay=self.weight_decay)


@TRAINERS.register(aliases=("nnUNetTrainerV2_Adam_ReduceOnPlateau",))
class TrainerV2AdamPlateau(_PlateauMixin, TrainerV2):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.initial_lr = 3e-4

    def _make_plateau_optimizer(self):
        return make_adam_optimizer(make_constant_schedule(self._plateau_lr),
                                   weight_decay=self.weight_decay)


@TRAINERS.register(aliases=("nnUNetTrainerV2_SGD_fixedSchedule2",))
class TrainerV2FixedSchedule2(TrainerV2):
    """Stepped polyLR: restart poly segments at epochs 0/700/900 (optimizer_and_lr/
    nnUNetTrainerV2_SGD_fixedSchedule2.py: poly within [0,700), then [700,900)
    from lr(700), then [900,1000) from lr(900))."""

    def current_lr(self) -> float:
        from multitalent_tpu.training.schedules import poly_lr
        ep = self.epoch
        if ep < 700:
            return poly_lr(ep, self.max_num_epochs, self.initial_lr)
        if ep < 900:
            return poly_lr(ep, self.max_num_epochs,
                           poly_lr(700, self.max_num_epochs, self.initial_lr))
        return poly_lr(ep, self.max_num_epochs,
                       poly_lr(900, self.max_num_epochs, self.initial_lr))


@TRAINERS.register(aliases=("nnUNetTrainerV2_reduceMomentumDuringTraining",))
class TrainerV2ReduceMomentum(TrainerV2):
    """Momentum 0.99 -> 0.9 linearly over epochs 800-1000 (optimizer_and_lr/
    nnUNetTrainerV2_reduceMomentumDuringTraining.py:25-42). The momentum is an
    optax hyperparameter injected per epoch; trace state carries over."""

    def initialize_optimizer(self):
        import optax
        from multitalent_tpu.training.schedules import make_poly_schedule
        schedule = make_poly_schedule(self.initial_lr, self.max_num_epochs,
                                      self.num_batches_per_epoch)
        self._mom_tx = optax.inject_hyperparams(
            lambda momentum: optax.chain(
                optax.add_decayed_weights(self.weight_decay),
                optax.clip_by_global_norm(12.0),
                optax.trace(decay=momentum, nesterov=True),
                optax.scale_by_learning_rate(schedule)))(momentum=0.99)
        return self._mom_tx

    def _current_momentum(self) -> float:
        if self.epoch > 800:
            return 0.99 - (0.99 - 0.9) / 200 * (self.epoch - 800)
        return 0.99

    def maybe_update_lr(self) -> None:
        super().maybe_update_lr()
        m = self._current_momentum()
        try:
            self.state.opt_state.hyperparams["momentum"] = jnp.asarray(m)
            self.print_to_log_file(f"current momentum {m:.4f}")
        except Exception:
            pass


@TRAINERS.register(aliases=("nnUNetTrainerV2_momentum09in2D",))
class TrainerV2Momentum09in2D(TrainerV2):
    """momentum 0.9 for 2D configs only (optimizer_and_lr/
    nnUNetTrainerV2_momentum09in2D.py)."""

    def initialize_optimizer(self):
        from multitalent_tpu.training.schedules import make_poly_schedule
        from multitalent_tpu.training.train_state import make_sgd_optimizer
        schedule = make_poly_schedule(self.initial_lr, self.max_num_epochs,
                                      self.num_batches_per_epoch)
        momentum = 0.9 if not self.threeD else 0.99
        return make_sgd_optimizer(schedule, momentum=momentum,
                                  weight_decay=self.weight_decay)


# -------------------------------------------------------------- more loss variants
@TRAINERS.register(aliases=("nnUNetTrainerV2_Loss_CEGDL",))
class TrainerV2LossCEGDL(TrainerV2):
    """GDL + CE (loss_function/nnUNetTrainerV2_Loss_CEGDL.py)."""

    def loss_fn(self, outputs, targets, extras):
        weights = [float(w) for w in self.ds_loss_weights]

        def fn(o, t):
            return L.gdl_loss(o, t) + L.robust_cross_entropy(o, t)

        return deep_supervision_loss(outputs, targets, fn, weights), {}


@TRAINERS.register(aliases=("nnUNetTrainerV2_Loss_DiceCE_noSmooth",))
class TrainerV2LossDiceCENoSmooth(TrainerV2):
    """DC+CE with dice smooth 0 (loss_function/nnUNetTrainerV2_Loss_DiceCE_noSmooth.py)."""

    def loss_fn(self, outputs, targets, extras):
        weights = [float(w) for w in self.ds_loss_weights]
        fn = partial(L.dc_and_ce_loss, batch_dice=self.batch_dice, smooth=0.0)
        return deep_supervision_loss(outputs, targets, fn, weights), {}


@TRAINERS.register(aliases=("nnUNetTrainerV2_Loss_MCCnoBG",))
class TrainerV2LossMCCnoBG(TrainerV2):
    def loss_fn(self, outputs, targets, extras):
        weights = [float(w) for w in self.ds_loss_weights]
        fn = partial(L.mcc_loss, do_bg=False)
        return deep_supervision_loss(outputs, targets, fn, weights), {}


@TRAINERS.register(aliases=("nnUNetTrainerV2_Loss_Dice_squared",))
class TrainerV2LossDiceSquared(TrainerV2):
    """Squared-denominator dice only (loss_function/...Loss_Dice_squared)."""

    def loss_fn(self, outputs, targets, extras):
        weights = [float(w) for w in self.ds_loss_weights]
        fn = partial(L.squared_dice_loss, batch_dice=self.batch_dice, do_bg=False)
        return deep_supervision_loss(outputs, targets, fn, weights), {}


@TRAINERS.register(aliases=("nnUNetTrainerV2_graduallyTransitionFromCEToDice",))
class TrainerV2CEtoDice(TrainerV2):
    """CE for 500 epochs, linear CE->Dice blend to 750, Dice-only after
    (loss_function/nnUNetTrainerV2_graduallyTransitionFromCEToDice.py:30-45).
    The weights enter the jitted step as ARRAYS via batch_extras, so the
    per-epoch change needs no re-jit."""

    def _ce_dice_weights(self):
        ep = min(self.epoch, self.max_num_epochs)
        if ep <= 500:
            return 2.0, 0.0
        if ep <= 750:
            w = 2.0 / 250 * (ep - 500)
            return 2.0 - w, w
        return 0.0, 2.0

    def batch_extras(self, batch):
        w_ce, w_dc = self._ce_dice_weights()
        return {"w_ce": np.float32(w_ce), "w_dc": np.float32(w_dc)}

    def loss_fn(self, outputs, targets, extras):
        weights = [float(w) for w in self.ds_loss_weights]

        def fn(o, t):
            dc = L.soft_dice_loss(o, t, batch_dice=self.batch_dice, do_bg=False)
            ce = L.robust_cross_entropy(o, t)
            return extras["w_ce"] * ce + extras["w_dc"] * dc

        return deep_supervision_loss(outputs, targets, fn, weights), {}


# ---------------------------------------------------------------- dice-mode forcing
@TRAINERS.register(aliases=("nnUNetTrainerV2_ForceBD",))
class TrainerV2ForceBD(TrainerV2):
    """Force batch dice regardless of the configuration default
    (loss_function/nnUNetTrainerV2_ForceBD.py)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.batch_dice = True


@TRAINERS.register(aliases=("nnUNetTrainerV2_ForceSD",))
class TrainerV2ForceSD(TrainerV2):
    """Force sample dice (loss_function/nnUNetTrainerV2_ForceSD.py)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.batch_dice = False


# ------------------------------------------------------------------- DA variants
@TRAINERS.register(aliases=("nnUNetTrainerV2_DA2",))
class TrainerV2DA2(TrainerV2):
    """DA2 (data_augmentation/nnUNetTrainerV2_DA2.py): independent per-axis
    scale, per-axis rotation probability, additive brightness."""

    def setup_DA_params(self) -> None:
        super().setup_DA_params()
        self.data_aug_params["independent_scale_factor_for_each_axis"] = True
        self.data_aug_params["rotation_p_per_axis"] = 0.5 if self.threeD else 1.0
        self.data_aug_params["do_additive_brightness"] = True


@TRAINERS.register(aliases=("nnUNetTrainerV2_independentScalePerAxis",))
class TrainerV2IndependentScale(TrainerV2):
    def setup_DA_params(self) -> None:
        super().setup_DA_params()
        self.data_aug_params["independent_scale_factor_for_each_axis"] = True


@TRAINERS.register(aliases=("nnUNetTrainerV2_DA3_BN",))
class TrainerV2DA3BN(TrainerV2DA5):
    """DA3 pipeline over a batchnorm network (data_augmentation/
    nnUNetTrainerV2_DA3.py BN subclass)."""

    def network_overrides(self) -> dict:
        return {**super().network_overrides(), "norm": "batch"}


@TRAINERS.register(aliases=("nnUNetTrainerV2_ResencUNet_DA3_BN",))
class TrainerV2ResencDA3BN(TrainerV2ResencUNetDA3):
    def network_overrides(self) -> dict:
        return {**super().network_overrides(), "norm": "batch"}


# --------------------------------------------------- ensembling copies + misc aliases
# nnUNetTrainerV2_copyX: identical trainers re-registered so k-fold ensembles can
# be built from independent runs (copies/nnUNetTrainerV2_copies.py). fp16: AMP is
# the default here (bf16 on TPU), so it aliases the production trainer.
TRAINERS.register(aliases=("nnUNetTrainerV2_copy1", "nnUNetTrainerV2_copy2",
                           "nnUNetTrainerV2_copy3", "nnUNetTrainerV2_copy4",
                           "nnUNetTrainerV2_fp16"))(TrainerV2)


# -------------------------------------------------------------- benchmark combos
from multitalent_tpu.training.trainers import (TrainerV2_2epochs,  # noqa: E402
                                               TrainerV2_5epochs,
                                               TrainerV2_dummyLoad)


@TRAINERS.register(aliases=("nnUNetTrainerV2_2epochs_dummyLoad",))
class TrainerV2_2epochsDummyLoad(TrainerV2_dummyLoad):
    """benchmarking/nnUNetTrainerV2_2epochs.py dummyLoad combo."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_num_epochs = 2


class _NoDSMixin:
    """Disable deep supervision (benchmarking *noDS variants)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.deep_supervision = False

    def setup_DA_params(self) -> None:
        super().setup_DA_params()
        self.deep_supervision_scales = [[1.0, 1.0, 1.0]]

    def network_overrides(self) -> dict:
        return {**super().network_overrides(), "deep_supervision": False}

    def loss_fn(self, outputs, targets, extras):
        outputs = [outputs] if not isinstance(outputs, (list, tuple)) else outputs
        targets = [targets] if not isinstance(targets, (list, tuple)) else targets
        return deep_supervision_loss(
            outputs, targets, L.robust_cross_entropy
            if self._ce_only else partial(L.dc_and_ce_loss,
                                          batch_dice=self.batch_dice),
            [1.0]), {}

    def eval_stats(self, outputs, targets, extras):
        outputs = [outputs] if not isinstance(outputs, (list, tuple)) else outputs
        targets = [targets] if not isinstance(targets, (list, tuple)) else targets
        return super().eval_stats(outputs, targets, extras)

    _ce_only = False


@TRAINERS.register(aliases=("nnUNetTrainerV2_5epochs_noDS",))
class TrainerV2_5epochsNoDS(_NoDSMixin, TrainerV2_5epochs):
    pass


@TRAINERS.register(aliases=("nnUNetTrainerV2_5epochs_CEnoDS",))
class TrainerV2_5epochsCEnoDS(_NoDSMixin, TrainerV2_5epochs):
    _ce_only = True


@TRAINERS.register(aliases=("nnUNetTrainerV2_5epochs_dummyLoadCEnoDS",))
class TrainerV2_5epochsDummyCEnoDS(_NoDSMixin, TrainerV2_dummyLoad):
    _ce_only = True


# DDP benchmark names: data parallelism is the same SPMD trainer here
TRAINERS.register(aliases=("nnUNetTrainerV2_DDP_5epochs",))(TrainerV2_5epochs)
TRAINERS.register(aliases=("nnUNetTrainerV2_DDP_5epochs_dummyLoad",))(TrainerV2_dummyLoad)


# ------------------------------------------------------------- transformer variants
@TRAINERS.register(aliases=("nnUNetTrainerV2_swinunetr_adam_ddp",))
class TrainerV2SwinUNETR(TrainerV2):
    """Plans-driven SwinUNETR under the standard DC+CE objective, Adam 1e-3,
    no deep supervision (transformers/nnUNetTrainerV2_SwinUNETR_ddp.py:53-120)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.initial_lr = 1e-3
        self.deep_supervision = False

    def setup_DA_params(self) -> None:
        super().setup_DA_params()
        self.deep_supervision_scales = [[1.0, 1.0, 1.0]]

    def initialize(self, training: bool = True, force_load_plans: bool = False) -> None:
        super().initialize(training, force_load_plans)
        self.ds_loss_weights = np.array([1.0])

    def initialize_optimizer(self):
        from multitalent_tpu.training.schedules import make_poly_schedule
        schedule = make_poly_schedule(self.initial_lr, self.max_num_epochs,
                                      self.num_batches_per_epoch)
        return make_adam_optimizer(schedule, weight_decay=self.weight_decay)

    def initialize_network(self) -> None:
        from multitalent_tpu.models.swin_unetr import SwinUNETR
        self.network = SwinUNETR(
            in_channels=self.num_input_channels, out_channels=self.num_classes,
            feature_size=48,
            dtype=jnp.bfloat16 if self.fp16 else jnp.float32)
        self.inference_nonlin = "softmax"

    def _as_lists(self, outputs, targets):
        outputs = [outputs] if not isinstance(outputs, (list, tuple)) else outputs
        targets = [targets] if not isinstance(targets, (list, tuple)) else targets
        return outputs, targets

    def loss_fn(self, outputs, targets, extras):
        outputs, targets = self._as_lists(outputs, targets)
        fn = partial(L.dc_and_ce_loss, batch_dice=self.batch_dice)
        return deep_supervision_loss(outputs, targets, fn, [1.0]), {}

    def eval_stats(self, outputs, targets, extras):
        outputs, targets = self._as_lists(outputs, targets)
        return super().eval_stats(outputs, targets, extras)


@TRAINERS.register(aliases=("nnUNetTrainerV2_swinunetr_adam_ddp_lr5e4",))
class TrainerV2SwinUNETRlr5e4(TrainerV2SwinUNETR):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.initial_lr = 5e-4


@TRAINERS.register(aliases=("nnUNetTrainerV2_cycleAtEnd2",))
class TrainerV2CycleAtEnd2(TrainerV2CycleAtEnd):
    """1200 epochs: normal poly schedule for 1000, then one 200-epoch cosine
    cycle (optimizer_and_lr/nnUNetTrainerV2_cycleAtEnd.py:66-92)."""

    cycle_epochs = 200

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_num_epochs = 1200


@TRAINERS.register(aliases=("nnUNetTrainerV2_ReLU_convReLUIN",))
class TrainerV2ReLUConvReLUIN(TrainerV2):
    """ReLU with conv->nonlin->norm block order (basic_block=
    ConvDropoutNonlinNorm; architectural_variants/
    nnUNetTrainerV2_ReLU_convReLUIN.py:22-46)."""

    def network_overrides(self) -> dict:
        return {"nonlin": "relu", "nonlin_first": True}


@TRAINERS.register(aliases=("nnUNetTrainerV2_lReLU_convReLUIN",))
class TrainerV2LReLUConvReLUIN(TrainerV2):
    """LeakyReLU with conv->nonlin->norm block order (architectural_variants/
    nnUNetTrainerV2_lReLU_convlReLUIN.py:22-46)."""

    def network_overrides(self) -> dict:
        return {"nonlin_first": True}


@TRAINERS.register(aliases=("nnUNetTrainerV2_resample33",))
class TrainerV2Resample33(TrainerV2):
    """Validation-export resampling ablation: full-3D cubic softmax resample
    (force_separate_z=False, order_z=3; resampling/
    nnUNetTrainerV2_resample33.py:47-55)."""

    def validate(self, *args, **kwargs):
        if kwargs.get("segmentation_export_kwargs") is None:
            kwargs["segmentation_export_kwargs"] = {
                "interpolation_order": 3, "force_separate_z": False,
                "interpolation_order_z": 3}
        return super().validate(*args, **kwargs)
