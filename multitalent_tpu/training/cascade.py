"""3d_lowres -> 3d_cascade_fullres pipeline.

Parity targets: nnunet/training/network_training/nnUNetTrainerV2_CascadeFullRes.py
(stage-1 trainer consuming the stage-0 segmentation as extra one-hot input
channels, corrupted during training so the network cannot blindly trust them),
nnunet/training/data_augmentation/pyramid_augmentations.py:23-139 (random binary
morphology + random connected-component removal corruption) and
nnunet/training/cascade_stuff/predict_next_stage.py:31-46 (export the lowres
model's predictions of every case, resampled to the fullres grid).

TPU-native shape: one-hot conversion + binary dilate/erode corruption run inside
the jitted augmentation step (augment/pipeline.make_cascade_augment_fn); the
connected-component-removal corruption needs scipy labeling and runs on the host
patch-sampler threads, per patch, before upload.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
from multitalent_tpu.native import label_3d as _cc_label_3d

from multitalent_tpu.data.loader import PatchSampler3D
from multitalent_tpu.registry import TRAINERS
from multitalent_tpu.training.trainers import TrainerV2
from multitalent_tpu.utils.fileops import maybe_mkdir


def remove_random_component(seg_patch: np.ndarray, rng: np.random.RandomState,
                            p_per_label: float = 1.0,
                            max_coverage: float = 0.15) -> np.ndarray:
    """Random connected-component removal on a previous-stage label patch
    (RemoveRandomConnectedComponentFromOneHotEncodingTransform parity,
    pyramid_augmentations.py:23-63: only components covering less than
    `max_coverage` of the patch are eligible)."""
    out = seg_patch.copy()
    for c in np.unique(out):
        if c <= 0 or rng.uniform() >= p_per_label:
            continue
        mask = out == c
        if mask.mean() == 0 or mask.mean() > max_coverage:
            continue
        lmap, n = _cc_label_3d(mask)
        if n == 0:
            continue
        victim = rng.randint(1, n + 1)
        out[lmap == victim] = 0
    return out


class CascadePatchSampler3D(PatchSampler3D):
    """Samples (data, [gt_seg, prev_stage_seg]) patches. The previous-stage
    segmentation lives in `<case>_segFromPrevStage.npz` next to the preprocessed
    data (written by predict_next_stage) and is cropped with the same bbox;
    CC-removal corruption is applied here when `corrupt=True` (training only)."""

    def __init__(self, *args, corrupt: bool = True,
                 cc_p_per_sample: float = 0.2, cc_p_per_label: float = 1.0,
                 cc_max_coverage: float = 0.15, **kwargs):
        kwargs["has_prev_stage"] = True
        super().__init__(*args, **kwargs)
        self.corrupt = corrupt
        # RemoveRandomConnectedComponentFromOneHotEncodingTransform knobs
        # (cascade_remove_conn_comp_* in data_aug_params,
        # nnUNetTrainerV2_CascadeFullRes.py:107-109)
        self.cc_p_per_sample = cc_p_per_sample
        self.cc_p_per_label = cc_p_per_label
        self.cc_max_coverage = cc_max_coverage

    def _load_prev(self, key: str) -> np.ndarray:
        path = os.path.join(os.path.dirname(self._data[key]["data_file"]),
                            f"{key}_segFromPrevStage.npz")
        return np.load(path)["data"]  # (1, Z, Y, X)

    def _sample_patch(self, key: str, force_fg: bool):
        from multitalent_tpu.data.dataset import load_case
        properties = self._properties(key)
        case_all_data = load_case(self._data[key], self.memmap_mode)
        bbox_lb = self._choose_bbox(np.array(case_all_data.shape[1:]), properties,
                                    force_fg)
        data = self._crop_pad(case_all_data[:-1], bbox_lb, self.pad_mode, 0)
        seg = self._crop_pad(case_all_data[-1:], bbox_lb, "constant", -1)
        prev = self._crop_pad(self._load_prev(key), bbox_lb, "constant", 0)
        if self.corrupt and self.rng.uniform() < self.cc_p_per_sample:
            prev[0] = remove_random_component(prev[0], self.rng,
                                              p_per_label=self.cc_p_per_label,
                                              max_coverage=self.cc_max_coverage)
        return data, np.concatenate([seg, prev.astype(np.float32)]), properties


@TRAINERS.register(aliases=("nnUNetTrainerV2CascadeFullRes",
                            "nnUNetTrainerCascadeFullRes"))
class TrainerV2CascadeFullRes(TrainerV2):
    """Stage-1 (fullres) trainer of the cascade. Network input = image modalities
    + one-hot of the previous stage's foreground classes."""

    def __init__(self, plans_file, fold, output_folder=None,
                 dataset_directory=None, batch_dice=True, stage=None,
                 unpack_data=True, deterministic=True, fp16=True,
                 previous_trainer="TrainerV2", seed: int = 12345):
        super().__init__(plans_file, fold, output_folder, dataset_directory,
                         batch_dice, stage, unpack_data, deterministic, fp16,
                         seed=seed)
        self.init_args = (plans_file, fold, output_folder, dataset_directory,
                          batch_dice, stage, unpack_data, deterministic, fp16,
                          previous_trainer)
        self.previous_trainer = previous_trainer

    @property
    def num_prev_classes(self) -> int:
        return self.num_classes - 1  # foreground classes of the previous stage

    def initialize_network(self) -> None:
        from multitalent_tpu.models.generic_unet import GenericUNet
        st = self.plans.stage(self.stage)
        self.network = GenericUNet(
            input_channels=self.num_input_channels + self.num_prev_classes,
            base_num_features=self.plans.base_num_features,
            num_classes=self.num_classes,
            pool_op_kernel_sizes=tuple(tuple(k) for k in st.pool_op_kernel_sizes),
            conv_kernel_sizes=tuple(tuple(k) for k in st.conv_kernel_sizes),
            conv_per_stage=self.plans.conv_per_stage,
            deep_supervision=self.deep_supervision,
            dtype=jnp.bfloat16 if self.fp16 else jnp.float32)

    def _init_state(self) -> None:
        import jax
        from multitalent_tpu.training.train_state import TrainState
        rng = jax.random.PRNGKey(self.seed)
        example = jnp.zeros(
            (1, *self.patch_size, self.num_input_channels + self.num_prev_classes),
            jnp.float32)
        variables = jax.jit(self.network.init)(rng, example)
        tx = self.initialize_optimizer()
        self.state = TrainState.create(self.network.apply, variables["params"], tx)

    def get_basic_generators(self):
        self.load_dataset()
        self.do_split()
        prev_file = os.path.join(
            self.folder_with_preprocessed_data,
            sorted(self.dataset.keys())[0] + "_segFromPrevStage.npz")
        assert os.path.isfile(prev_file), (
            "Cannot train the cascade: previous-stage segmentations are missing. "
            "Run 3d_lowres training (which exports them via predict_next_stage) "
            f"first. Expected e.g. {prev_file}")

        dap = self.data_aug_params

        def tr_factory(worker_id: int):
            return CascadePatchSampler3D(
                self.dataset_tr, self.basic_generator_patch_size, self.patch_size,
                self.batch_size, corrupt=True,
                cc_p_per_sample=float(
                    dap.get("cascade_remove_conn_comp_p", 0.2)),
                cc_p_per_label=float(dap.get(
                    "cascade_remove_conn_comp_p_per_label", 1.0)),
                cc_max_coverage=float(dap.get(
                    "cascade_remove_conn_comp_max_size_percent_threshold",
                    0.15)),
                oversample_foreground_percent=self.oversample_foreground_percent,
                pad_mode="constant", seed=self.seed + worker_id)

        def val_factory(worker_id: int):
            return CascadePatchSampler3D(
                self.dataset_val, self.patch_size, self.patch_size,
                self.batch_size, corrupt=False,
                oversample_foreground_percent=self.oversample_foreground_percent,
                pad_mode="constant", seed=self.seed + 1000 + worker_id)

        return tr_factory, val_factory

    def _build_step_functions(self) -> None:
        # swap in the cascade augmentation (joint warp, intensity on image
        # channels only, one-hot + corruption) before jitting the steps
        from multitalent_tpu.augment import pipeline as P
        import jax
        from multitalent_tpu.parallel.mesh import plan_batch_sharding

        self._mesh = None
        plan = plan_batch_sharding(self.batch_size, self.patch_size)
        self._sharding_plan = plan
        if plan is not None:
            self._mesh = plan.mesh
            self._volume_sharding = plan.volume_sharding
            self._batch_sharding = plan.batch_sharding
            self.print_to_log_file(plan.description)

        augment = P.make_cascade_augment_fn(
            self.patch_size, self.deep_supervision_scales, self.data_aug_params,
            self.num_input_channels, self.num_prev_classes)
        val_transform = P.make_cascade_val_transform_fn(
            self.patch_size, self.deep_supervision_scales, self.data_aug_params,
            self.num_input_channels, self.num_prev_classes)
        model = self.network

        splan = self._sharding_plan

        def _constrain(data):
            if splan is not None:
                data = splan.constrain_activations(data, channels_last=True)
            return data

        def train_core(state, data, targets, extras):
            data = _constrain(data)

            def compute(params):
                outputs = model.apply({"params": params}, data,
                                      deterministic=False)
                return self.loss_fn(outputs, targets, extras)

            (loss, aux), grads = jax.value_and_grad(compute, has_aux=True)(
                state.params)
            state = state.apply_gradients(grads)
            return state, loss, aux

        def eval_step(state, data_bc, seg_b2, extras):
            data, targets = val_transform(data_bc, seg_b2)
            data = _constrain(data)
            outputs = model.apply({"params": state.params}, data,
                                  deterministic=True)
            loss, aux = self.loss_fn(outputs, targets, extras)
            return loss, aux, self.eval_stats(outputs, targets, extras)

        # augmentation/spatial-mesh fence is structural: one choke point
        from multitalent_tpu.parallel.mesh import compile_train_step
        self._train_step = compile_train_step(splan, augment, train_core)
        self._eval_step = jax.jit(eval_step)

    def predict_preprocessed_data_return_seg_and_softmax(
            self, data: np.ndarray, do_mirroring: bool = True,
            step_size: float = 0.5, use_gaussian: bool = True, params=None):
        """`data` must already carry the one-hot previous-stage channels appended
        (modalities + num_prev_classes channels)."""
        assert data.shape[0] == self.num_input_channels + self.num_prev_classes, (
            f"cascade inference expects {self.num_input_channels}+"
            f"{self.num_prev_classes} channels, got {data.shape[0]} "
            "(append the one-hot previous-stage segmentation)")
        from multitalent_tpu.ops.packed_unet import (
            make_inference_apply_fn, make_packed_inference_apply_fn)
        from multitalent_tpu.ops.sliding_window import (
            SlidingWindowPredictor, segmentation_from_probabilities)
        apply_fn = make_inference_apply_fn(self.network)
        patch = tuple(int(p) for p in self.patch_size)
        pfn, pfac = make_packed_inference_apply_fn(self.network, patch)

        predictor = SlidingWindowPredictor(
            apply_fn, patch,
            in_channels=self.num_input_channels + self.num_prev_classes,
            num_classes=self.num_classes, nonlin=self.inference_nonlin,
            step_size=step_size, do_mirroring=do_mirroring,
            use_gaussian=use_gaussian,
            packed_apply=(pfn, pfac) if pfn is not None else None)
        probs = predictor(params if params is not None else self.state.params, data)
        return segmentation_from_probabilities(np.asarray(probs),
                                               self.regions_class_order), probs

    def validate(self, *args, **kwargs):
        from multitalent_tpu.inference.validation import run_cascade_validation
        return run_cascade_validation(self, *args, **kwargs)


def one_hot_prev_stage_channels(prev_seg: np.ndarray, num_fg_classes: int) -> np.ndarray:
    """(Z, Y, X) labels -> (num_fg_classes, Z, Y, X) one-hot of foreground classes
    (to_one_hot role for inference inputs)."""
    out = np.zeros((num_fg_classes, *prev_seg.shape), np.float32)
    for i in range(num_fg_classes):
        out[i] = prev_seg == (i + 1)
    return out


def predict_next_stage(trainer, stage_to_be_predicted_folder: str) -> None:
    """Export the lowres model's segmentation of EVERY case, resampled to the next
    stage's grid, as `<case>_segFromPrevStage.npz`
    (predict_next_stage.py:31-46)."""
    from multitalent_tpu.preprocessing.resampling import resample_data_or_seg
    from multitalent_tpu.data.dataset import load_case
    from multitalent_tpu.utils.fileops import load_pickle

    maybe_mkdir(stage_to_be_predicted_folder)
    for key in sorted(trainer.dataset.keys()):
        case_all = np.array(load_case(trainer.dataset[key], "r"))
        data = case_all[:-1]
        seg, _ = trainer.predict_preprocessed_data_return_seg_and_softmax(
            data, do_mirroring=False)
        target_file = os.path.join(stage_to_be_predicted_folder, f"{key}.npz")
        if os.path.isfile(target_file):
            target_shape = np.load(target_file)["data"].shape[1:]
        else:
            props = load_pickle(trainer.dataset[key]["properties_file"])
            target_shape = tuple(int(s) for s in props["size_after_resampling"])
        seg_resampled = resample_data_or_seg(
            seg[None].astype(np.float32), target_shape, is_seg=True, order=1)
        np.savez_compressed(
            os.path.join(stage_to_be_predicted_folder,
                         f"{key}_segFromPrevStage.npz"),
            data=seg_resampled.astype(np.uint8))
        print(f"predicted next stage for {key}")


# ------------------------------------------------------------ cascade variants
# The reference's cascade ablations tweak schedule or the prev-stage corruption
# knobs only (nnUNet_variants/cascade/*.py).

def _cascade_da(self, **updates):
    TrainerV2CascadeFullRes.setup_DA_params(self)
    self.data_aug_params.update(updates)


@TRAINERS.register(aliases=("nnUNetTrainerV2CascadeFullRes_lowerLR",))
class TrainerV2CascadeLowerLR(TrainerV2CascadeFullRes):
    """cascade/nnUNetTrainerV2CascadeFullRes_lowerLR.py:22-28: lr 1e-3."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.initial_lr = 1e-3


@TRAINERS.register(aliases=("nnUNetTrainerV2CascadeFullRes_shorter",))
class TrainerV2CascadeShorter(TrainerV2CascadeFullRes):
    """cascade/nnUNetTrainerV2CascadeFullRes_shorter.py: 500 epochs."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.max_num_epochs = 500


@TRAINERS.register(aliases=("nnUNetTrainerV2CascadeFullRes_shorter_lowerLR",))
class TrainerV2CascadeShorterLowerLR(TrainerV2CascadeFullRes):
    """cascade/nnUNetTrainerV2CascadeFullRes_shorter_lowerLR.py."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.max_num_epochs = 500
        self.initial_lr = 1e-3


@TRAINERS.register(aliases=("nnUNetTrainerV2CascadeFullRes_noConnComp",))
class TrainerV2CascadeNoConnComp(TrainerV2CascadeFullRes):
    """DAVariants.py:19-30: disable CC-removal corruption."""

    def setup_DA_params(self):
        _cascade_da(
            self,
            cascade_random_binary_transform_p=0.4,
            cascade_random_binary_transform_p_per_label=1.0,
            cascade_random_binary_transform_size=(1, 8),
            cascade_remove_conn_comp_p=0.0,
            cascade_remove_conn_comp_max_size_percent_threshold=0.15)


@TRAINERS.register(aliases=("nnUNetTrainerV2CascadeFullRes_smallerBinStrel",))
class TrainerV2CascadeSmallerBinStrel(TrainerV2CascadeFullRes):
    """DAVariants.py:33-44: structuring element range (1, 5)."""

    def setup_DA_params(self):
        _cascade_da(
            self,
            cascade_random_binary_transform_p=0.4,
            cascade_random_binary_transform_p_per_label=1.0,
            cascade_random_binary_transform_size=(1, 5),
            cascade_remove_conn_comp_p=0.2,
            cascade_remove_conn_comp_max_size_percent_threshold=0.15)


@TRAINERS.register(aliases=("nnUNetTrainerV2CascadeFullRes_EducatedGuess",))
class TrainerV2CascadeEducatedGuess(TrainerV2CascadeFullRes):
    """DAVariants.py:47-58."""

    def setup_DA_params(self):
        _cascade_da(
            self,
            cascade_random_binary_transform_p=0.5,
            cascade_random_binary_transform_p_per_label=0.5,
            cascade_random_binary_transform_size=(1, 5),
            cascade_remove_conn_comp_p=0.2,
            cascade_remove_conn_comp_max_size_percent_threshold=0.10)


@TRAINERS.register(aliases=("nnUNetTrainerV2CascadeFullRes_EducatedGuess2",))
class TrainerV2CascadeEducatedGuess2(TrainerV2CascadeFullRes):
    """DAVariants.py:61-72: like EducatedGuess, CC removal off."""

    def setup_DA_params(self):
        _cascade_da(
            self,
            cascade_random_binary_transform_p=0.5,
            cascade_random_binary_transform_p_per_label=0.5,
            cascade_random_binary_transform_size=(1, 5),
            cascade_remove_conn_comp_p=0.0,
            cascade_remove_conn_comp_max_size_percent_threshold=0.10)


@TRAINERS.register(aliases=("nnUNetTrainerV2CascadeFullRes_EducatedGuess3",))
class TrainerV2CascadeEducatedGuess3(TrainerV2CascadeFullRes):
    """DAVariants.py:75-87: always corrupt, per-label p 0.33."""

    def setup_DA_params(self):
        _cascade_da(
            self,
            cascade_random_binary_transform_p=1.0,
            cascade_random_binary_transform_p_per_label=0.33,
            cascade_random_binary_transform_size=(1, 5),
            cascade_remove_conn_comp_p=0.0,
            cascade_remove_conn_comp_max_size_percent_threshold=0.10)
