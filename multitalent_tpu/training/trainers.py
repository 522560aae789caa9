"""Plans-driven trainers (the nnUNetTrainer / nnUNetTrainerV2 layer), TPU-native.

Parity targets: nnunet/training/network_training/nnUNetTrainer.py:48-734 (plans
processing, generators, online foreground dice) and nnUNetTrainerV2.py:40-444 (SGD
nesterov 0.99 + polyLR + grad-clip 12, deep supervision with 1/2^i weights and the
lowest level masked, DS-aware augmentation params, 5-fold split handling).

TPU-native shape — one SPMD program instead of trainer-subclass process plumbing:

- `TrainerV2` is simultaneously the single-device AND the multi-device trainer. The
  reference needed three classes (V2, V2_DP, V2_DDP) because CUDA data parallelism is
  process topology; here the jitted train step is compiled over a 1-D "data" mesh and
  XLA inserts the gradient psum. The DDP-only features (global batch dice via
  allgathered statistics, nnUNetTrainerV2_DDP.py:249-282) fall out for free: the loss
  computes its reductions over the *global* sharded batch. Hence the reference names
  nnUNetTrainerV2_DP / nnUNetTrainerV2_DDP are registered as aliases of TrainerV2.
- augmentation + forward + backward + optimizer update are a single jitted, donated
  function: one host->device transfer (the raw patch batch) per iteration, no
  12-process augmentation pool (data_augmentation_moreDA.py:163 is replaced by
  augment/pipeline.py fused into the step).
- bf16 compute / fp32 params; no GradScaler (TPU bf16 needs no loss scaling).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from multitalent_tpu.augment.params import (default_2D_augmentation_params,
                                            default_3D_augmentation_params,
                                            get_patch_size)
from multitalent_tpu.augment.pipeline import (ds_scales_from_pools, make_augment_fn,
                                              make_val_transform_fn)
from multitalent_tpu.data.dataset import kfold_split, load_dataset, unpack_dataset
from multitalent_tpu.data.loader import PatchSampler2D, PatchSampler3D, PrefetchPipeline
from multitalent_tpu.plans import Plans, load_plans
from multitalent_tpu.registry import TRAINERS
from multitalent_tpu.training.losses import (dc_and_ce_loss, deep_supervision_loss,
                                             ds_loss_weights)
from multitalent_tpu.training.schedules import make_poly_schedule, poly_lr
from multitalent_tpu.training.train_state import TrainState, make_sgd_optimizer
from multitalent_tpu.training.trainer_base import NetworkTrainerBase
from multitalent_tpu.utils.fileops import load_pickle, save_pickle, maybe_mkdir


@TRAINERS.register(aliases=("nnUNetTrainerV2", "nnUNetTrainerV2_DP",
                            "nnUNetTrainerV2_DDP", "nnUNetTrainer"))
class TrainerV2(NetworkTrainerBase):
    """The production plans-driven trainer."""

    def __init__(self, plans_file, fold, output_folder=None, dataset_directory=None,
                 batch_dice=True, stage=None, unpack_data=True, deterministic=True,
                 fp16=True, seed: int = 12345):
        super().__init__(deterministic, fp16)
        self.init_args = (plans_file, fold, output_folder, dataset_directory,
                          batch_dice, stage, unpack_data, deterministic, fp16)
        self.plans_file = plans_file
        self.plans: Plans | None = None
        self.fold = fold
        self.output_folder = output_folder
        self.dataset_directory = dataset_directory
        self.batch_dice = batch_dice
        self.stage = stage
        self.unpack_data = unpack_data
        self.seed = seed

        self.initial_lr = 1e-2
        self.weight_decay = 3e-5
        self.oversample_foreground_percent = 0.33
        self.pin_memory = True  # no-op; kept for arg parity

        self.online_eval_foreground_dc: list[np.ndarray] = []
        self.online_eval_tp: list[np.ndarray] = []
        self.online_eval_fp: list[np.ndarray] = []
        self.online_eval_fn: list[np.ndarray] = []

        self.deep_supervision = True
        self.ds_loss_weights: np.ndarray | None = None
        self.data_aug_params: dict | None = None

        if output_folder is not None and fold is not None:
            self.output_folder = os.path.join(output_folder, f"fold_{fold}")

    # ----------------------------------------------------------- plans handling
    def load_plans_file(self) -> None:
        self.plans = (self.plans_file if isinstance(self.plans_file, Plans)
                      else load_plans(self.plans_file))

    def process_plans(self, plans: Plans) -> None:
        """nnUNetTrainer.process_plans parity (nnUNetTrainer.py:326-392)."""
        if self.stage is None:
            assert len(plans.plans_per_stage) == 1, \
                "stage must be specified for multi-stage plans"
            self.stage = list(plans.plans_per_stage.keys())[0]
        st = plans.stage(self.stage)
        self.stage_plans = st
        self.batch_size = st.batch_size
        self.patch_size = np.array(st.patch_size, dtype=int)
        self.net_pool_per_axis = st.num_pool_per_axis
        self.net_num_pool_op_kernel_sizes = st.pool_op_kernel_sizes
        self.net_conv_kernel_sizes = st.conv_kernel_sizes
        self.do_dummy_2D_aug = st.do_dummy_2D_data_aug
        self.num_input_channels = plans.num_modalities
        self.num_classes = plans.num_classes + 1  # +1 background
        self.classes = plans.all_classes
        self.use_mask_for_norm = plans.use_mask_for_norm
        self.base_num_features = plans.base_num_features
        self.conv_per_stage = plans.conv_per_stage
        self.threeD = len(self.patch_size) == 3

    def setup_DA_params(self) -> None:
        """nnUNetTrainerV2.setup_DA_params parity (nnUNetTrainerV2.py:341-391)."""
        self.deep_supervision_scales = ds_scales_from_pools(
            self.net_num_pool_op_kernel_sizes)
        if self.threeD:
            p = dict(default_3D_augmentation_params)
            if self.do_dummy_2D_aug:
                p["dummy_2D"] = True
                p["elastic_deform_alpha"] = default_2D_augmentation_params.get(
                    "elastic_deform_alpha")
                p["rotation_x"] = default_2D_augmentation_params["rotation_x"]
                p["rotation_y"] = default_2D_augmentation_params["rotation_y"]
                p["rotation_z"] = default_2D_augmentation_params["rotation_z"]
        else:
            p = dict(default_2D_augmentation_params)
            if max(self.patch_size) / min(self.patch_size) > 1.5:
                p["rotation_x"] = (-15.0 * 2 * np.pi / 360, 15.0 * 2 * np.pi / 360)
        p["mask_was_used_for_normalization"] = self.use_mask_for_norm
        p["scale_range"] = (0.7, 1.4)
        p["do_elastic"] = False
        p["selected_seg_channels"] = [0]

        if self.do_dummy_2D_aug:
            self.basic_generator_patch_size = get_patch_size(
                self.patch_size[1:], p["rotation_x"], p["rotation_y"],
                p["rotation_z"], p["scale_range"])
            self.basic_generator_patch_size = np.array(
                [self.patch_size[0]] + list(self.basic_generator_patch_size))
        else:
            self.basic_generator_patch_size = get_patch_size(
                self.patch_size, p["rotation_x"], p["rotation_y"], p["rotation_z"],
                p["scale_range"])
        p["patch_size_for_spatialtransform"] = self.patch_size
        self.data_aug_params = p

    # ------------------------------------------------------------------- splits
    def do_split(self) -> None:
        """splits_final.pkl handling incl. 'all' fold and the random 80:20 fallback
        for out-of-range folds (nnUNetTrainerV2.py:276-339)."""
        if self.fold == "all":
            tr_keys = val_keys = list(self.dataset.keys())
        else:
            splits_file = os.path.join(self.dataset_directory, "splits_final.pkl")
            if not os.path.isfile(splits_file):
                self.print_to_log_file("Creating new 5-fold cross-validation split...")
                splits = kfold_split(list(self.dataset.keys()))
                save_pickle(splits, splits_file)
            else:
                splits = load_pickle(splits_file)
            if self.fold < len(splits):
                tr_keys = splits[self.fold]["train"]
                val_keys = splits[self.fold]["val"]
            else:
                self.print_to_log_file(
                    f"INFO: requested fold {self.fold} but split file has only "
                    f"{len(splits)} folds. Using random 80:20 split.")
                rnd = np.random.RandomState(seed=12345 + self.fold)
                keys = np.sort(list(self.dataset.keys()))
                idx_tr = rnd.choice(len(keys), int(len(keys) * 0.8), replace=False)
                idx_val = [i for i in range(len(keys)) if i not in idx_tr]
                tr_keys = [keys[i] for i in idx_tr]
                val_keys = [keys[i] for i in idx_val]
        tr_keys.sort()
        val_keys.sort()
        self.dataset_tr = {k: self.dataset[k] for k in tr_keys}
        self.dataset_val = {k: self.dataset[k] for k in val_keys}

    # --------------------------------------------------------------- generators
    def load_dataset(self) -> None:
        self.folder_with_preprocessed_data = os.path.join(
            self.dataset_directory,
            self.plans.data_identifier + f"_stage{self.stage}")
        self.dataset = load_dataset(self.folder_with_preprocessed_data)

    def sampler_class(self):
        return PatchSampler3D if self.threeD else PatchSampler2D

    def get_basic_generators(self):
        self.load_dataset()
        self.do_split()
        cls = self.sampler_class()

        def tr_factory(worker_id: int):
            return cls(self.dataset_tr, self.basic_generator_patch_size,
                       self.patch_size, self.batch_size,
                       oversample_foreground_percent=self.oversample_foreground_percent,
                       pad_mode="constant", seed=self.seed + worker_id)

        def val_factory(worker_id: int):
            return cls(self.dataset_val, self.patch_size, self.patch_size,
                       self.batch_size,
                       oversample_foreground_percent=self.oversample_foreground_percent,
                       pad_mode="constant", seed=self.seed + 1000 + worker_id)

        return tr_factory, val_factory

    # ------------------------------------------------------------------ network
    def network_overrides(self) -> dict:
        """GenericUNet constructor overrides for architectural-variant subclasses
        (the reference's variants re-call the Generic_UNet constructor with swapped
        norm_op/nonlin/conv_per_stage, e.g. nnUNetTrainerV2_GN.py:24-52)."""
        return {}

    def initialize_network(self) -> None:
        from multitalent_tpu.models.generic_unet import build_unet_from_plans
        self.network = build_unet_from_plans(
            self.plans, self.stage, deep_supervision=self.deep_supervision,
            dtype=jnp.bfloat16 if self.fp16 else jnp.float32,
            num_classes=self.num_classes, **self.network_overrides())

    def initialize_optimizer(self):
        schedule = make_poly_schedule(self.initial_lr, self.max_num_epochs,
                                      self.num_batches_per_epoch)
        return make_sgd_optimizer(schedule, momentum=0.99, nesterov=True,
                                  weight_decay=self.weight_decay, clip_norm=12.0)

    def _init_state(self) -> None:
        rng = jax.random.PRNGKey(self.seed)
        example = jnp.zeros((1, *self.patch_size, self.num_input_channels),
                            jnp.float32)
        variables = jax.jit(self.network.init)(rng, example)
        tx = self.initialize_optimizer()
        self.state = TrainState.create(self.network.apply, variables["params"], tx)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(self.state.params))
        self.print_to_log_file(f"network initialized: {n_params:,} parameters")

    # ------------------------------------------------------------ loss plumbing
    def loss_fn(self, outputs, targets, extras: dict):
        """Deep-supervised DC+CE. Returns (scalar loss, aux metrics dict); aux values
        are logged per-iteration (MultiTalent adds its ce/dice components here)."""
        weights = [float(w) for w in self.ds_loss_weights]  # static: skips w==0 levels
        loss = deep_supervision_loss(
            outputs, targets,
            partial(dc_and_ce_loss, batch_dice=self.batch_dice), weights)
        return loss, {}

    def batch_extras(self, batch: dict) -> dict:
        """Additional device arrays derived from the host batch (e.g. MultiTalent's
        valid-region mask). Keys must be stable across iterations (static pytree)."""
        return {}

    def eval_stats(self, outputs, targets, extras):
        """Online foreground-dice statistics, traced inside the jitted eval step
        (nnUNetTrainerV2.run_online_evaluation, nnUNetTrainerV2.py:196-223): hard
        argmax vs. the full-res DS target, per-class tp/fp/fn summed over batch+space
        (a psum across devices when the batch is sharded)."""
        num_classes = self.num_classes
        pred = jnp.argmax(outputs[0], axis=-1)
        y = targets[0].astype(jnp.int32)
        axes = tuple(range(pred.ndim))
        pred_oh = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)[..., 1:]
        y_oh = jax.nn.one_hot(y, num_classes, dtype=jnp.float32)[..., 1:]
        tp = jnp.sum(pred_oh * y_oh, axis=axes)
        fp = jnp.sum(pred_oh * (1 - y_oh), axis=axes)
        fn = jnp.sum((1 - pred_oh) * y_oh, axis=axes)
        return tp, fp, fn

    # -------------------------------------------------------------- jitted steps
    def _build_step_functions(self) -> None:
        from multitalent_tpu.parallel.mesh import (distribute_batch_size,
                                                   plan_batch_sharding)
        self._mesh = None
        plan = plan_batch_sharding(self.batch_size, self.patch_size)
        self._sharding_plan = plan
        if plan is not None:
            self._mesh = plan.mesh
            self._volume_sharding = plan.volume_sharding
            self._batch_sharding = plan.batch_sharding
            self.print_to_log_file(plan.description)
            n_data = plan.mesh.shape.get("data", 1)
            if n_data > 1:
                # --dbs parity record: per-shard batch / fg-oversample split
                # (nnUNetTrainerV2_DDP.set_batch_size_and_oversample, :75-117).
                # The host sampler draws the GLOBAL batch with the last
                # o-fraction fg-forced, so sharding preserves the policy.
                sizes, frac_fn = distribute_batch_size(self.batch_size, n_data)
                self.print_to_log_file(
                    f"per-shard batch sizes {sizes}, fg-oversample fractions "
                    f"{[round(f, 3) for f in frac_fn(self.oversample_foreground_percent)]}")

        augment = make_augment_fn(self.patch_size, self.deep_supervision_scales,
                                  self.data_aug_params, self.num_input_channels)
        val_transform = make_val_transform_fn(
            self.patch_size, self.deep_supervision_scales, self.data_aug_params,
            self.num_input_channels)
        # packed (space-to-depth) execution of the small-channel stages when the
        # network qualifies — ~2x step time on v5e, numerically equivalent
        from multitalent_tpu.ops.packed_unet import make_train_forward_fn
        forward = make_train_forward_fn(self.network)

        plan = self._sharding_plan

        def _constrain(data):
            # hybrid (data, space) plans: the host batch arrives batch-sharded
            # only (rotation-enlarged patches have odd extents); once augment
            # has cropped to the final patch, pin batch-only then reshard to
            # the spatial layout (see BatchShardingPlan.constrain_activations)
            if plan is not None:
                data = plan.constrain_activations(data, channels_last=True)
            return data

        def train_core(state, data, targets, extras):
            data = _constrain(data)

            def compute(params):
                outputs = forward(params, data, deterministic=False)
                return self.loss_fn(outputs, targets, extras)

            (loss, aux), grads = jax.value_and_grad(compute, has_aux=True)(state.params)
            state = state.apply_gradients(grads)
            return state, loss, aux

        def eval_step(state, data_bc, seg_b1, extras):
            data, targets = val_transform(data_bc, seg_b1)
            data = _constrain(data)
            outputs = forward(state.params, data, deterministic=True)
            loss, aux = self.loss_fn(outputs, targets, extras)
            return loss, aux, self.eval_stats(outputs, targets, extras)

        # the XLA-miscompile fence for spatially-sharded plans lives in ONE
        # place (mesh.compile_train_step): augmentation compiles as its own
        # batch-only program when plan.space_axis is set
        from multitalent_tpu.parallel.mesh import compile_train_step
        self._train_step = compile_train_step(plan, augment, train_core)
        self._eval_step = jax.jit(eval_step)

    def _put_batch(self, arrays):
        """Place host batch arrays: 5-D volumes get the plan's (data, space)
        sharding, lower-rank extras (e.g. (b, R) region masks) shard on the
        batch axis only."""
        if self._mesh is not None:
            return tuple(jax.device_put(
                a, self._volume_sharding if np.ndim(a) == 5
                else self._batch_sharding) for a in arrays)
        return arrays

    # ---------------------------------------------------------------- lifecycle
    def initialize(self, training: bool = True, force_load_plans: bool = False) -> None:
        if self.was_initialized and not force_load_plans:
            return
        if self.output_folder is not None:
            maybe_mkdir(self.output_folder)
        if self.plans is None or force_load_plans:
            self.load_plans_file()
        self.process_plans(self.plans)
        self.setup_DA_params()

        # one weight per deep-supervision output; the scales list length defines it
        # (GenericUNet: len(pools); resenc UNet: len(pools)-1)
        num_ds_outputs = len(self.deep_supervision_scales)
        self.ds_loss_weights = ds_loss_weights(num_ds_outputs, mask_lowest=True)

        if training:
            if self.dataset_directory is not None:
                tr_factory, val_factory = self.get_basic_generators()
                if self.unpack_data:
                    self.print_to_log_file("unpacking dataset")
                    unpack_dataset(self.folder_with_preprocessed_data)
                num_threads = int(self.data_aug_params.get("num_threads", 3))
                self.tr_gen = PrefetchPipeline(tr_factory, num_workers=num_threads)
                self.val_gen = PrefetchPipeline(val_factory, num_workers=1)
                self.print_to_log_file(
                    "TRAINING KEYS:\n %s" % str(sorted(self.dataset_tr.keys())),
                    also_print_to_console=False)
                self.print_to_log_file(
                    "VALIDATION KEYS:\n %s" % str(sorted(self.dataset_val.keys())),
                    also_print_to_console=False)
        self.initialize_network()
        self._init_state()
        self._build_step_functions()
        self._iter_rng = jax.random.PRNGKey(self.seed + 777)
        self.was_initialized = True
        self.initialized = True

    # ---------------------------------------------------------------- iteration
    def run_iteration(self, data_generator, do_backprop: bool = True,
                      run_online_evaluation: bool = False) -> float:
        batch = next(data_generator)
        data, seg = batch["data"], batch["seg"]
        extras = self.batch_extras(batch)
        data, seg = self._put_batch((data, seg))
        if self._mesh is not None and extras:
            extras = {k: jax.device_put(np.asarray(v), self._batch_sharding)
                      for k, v in extras.items()}
        if do_backprop:
            self._iter_rng, rng = jax.random.split(self._iter_rng)
            self.state, loss, aux = self._train_step(self.state, rng, data, seg, extras)
        else:
            loss, aux, stats = self._eval_step(self.state, data, seg, extras)
            if run_online_evaluation:
                self.run_online_evaluation(stats)
        self.on_iteration_metrics(aux, do_backprop)
        return float(loss)

    def on_iteration_metrics(self, aux: dict, was_train: bool) -> None:
        """Hook for per-iteration aux-metric logging (MultiTalent ce/dice)."""

    # --------------------------------------------------------------- online eval
    def run_online_evaluation(self, stats) -> None:
        tp, fp, fn = (np.asarray(s) for s in stats)
        self.online_eval_tp.append(tp)
        self.online_eval_fp.append(fp)
        self.online_eval_fn.append(fn)

    def finish_online_evaluation(self) -> None:
        """Global per-class foreground dice over the epoch
        (nnUNetTrainer.finish_online_evaluation, nnUNetTrainer.py:683-724)."""
        if not self.online_eval_tp:
            return
        tp = np.sum(self.online_eval_tp, 0)
        fp = np.sum(self.online_eval_fp, 0)
        fn = np.sum(self.online_eval_fn, 0)
        global_dc_per_class = [2 * t / (2 * t + f + n) if (2 * t + f + n) > 0 else np.nan
                               for t, f, n in zip(tp, fp, fn)]
        finite = [d for d in global_dc_per_class if not np.isnan(d)]
        self.all_val_eval_metrics.append(float(np.mean(finite)) if finite else 0.0)
        self.print_to_log_file(
            "Average global foreground Dice:",
            [np.round(d, 4) for d in global_dc_per_class])
        self.print_to_log_file("(interpret this as an estimate for the Dice of the "
                               "different classes. This is not exact.)")
        self.online_eval_tp = []
        self.online_eval_fp = []
        self.online_eval_fn = []

    # ----------------------------------------------------------------------- lr
    def current_lr(self) -> float:
        return float(poly_lr(min(self.epoch, self.max_num_epochs - 1),
                             self.max_num_epochs, self.initial_lr))

    def maybe_update_lr(self) -> None:
        # lr lives inside the optax schedule; we only log it (the printed value is
        # the lr the *next* epoch will use, matching maybe_update_lr's print)
        self.print_to_log_file(
            "lr:", np.round(poly_lr(self.epoch + 1, self.max_num_epochs,
                                    self.initial_lr), decimals=6))

    def on_epoch_end(self) -> bool:
        cont = super().on_epoch_end()
        # epoch-100 momentum rescue (nnUNetTrainerV2.py:420-427) is not replicated:
        # it mutates torch optimizer state mid-run as a divergence workaround; with
        # bf16 + our optax state the documented failure mode has not been observed.
        return cont and self.epoch < self.max_num_epochs

    # ---------------------------------------------------------------- inference
    inference_nonlin = "softmax"
    regions_class_order = None

    def get_sliding_window_predictor(self, do_mirroring: bool = True,
                                     step_size: float = 0.5,
                                     use_gaussian: bool = True):
        """Tiled predictor over this trainer's network
        (SegmentationNetwork.predict_3D analog, neural_network.py:73)."""
        from multitalent_tpu.ops.packed_unet import (
            make_inference_apply_fn, make_packed_inference_apply_fn)
        from multitalent_tpu.ops.sliding_window import SlidingWindowPredictor
        apply_fn = make_inference_apply_fn(self.network)
        patch = tuple(int(p) for p in self.patch_size)
        packed_apply = None
        if self.threeD:
            pfn, pfac = make_packed_inference_apply_fn(self.network, patch)
            if pfn is not None:
                packed_apply = (pfn, pfac)
        mirror_axes = (0, 1, 2) if self.threeD else (0, 1)
        return SlidingWindowPredictor(
            apply_fn, patch,
            in_channels=self.num_input_channels, num_classes=self.num_classes,
            nonlin=self.inference_nonlin, step_size=step_size,
            do_mirroring=do_mirroring, mirror_axes=mirror_axes,
            use_gaussian=use_gaussian, packed_apply=packed_apply)

    def predict_preprocessed_data_return_seg_and_softmax(
            self, data: np.ndarray, do_mirroring: bool = True,
            step_size: float = 0.5, use_gaussian: bool = True, params=None):
        """data (C, Z, Y, X) preprocessed -> (seg ZYX, probabilities (K, Z, Y, X))."""
        from multitalent_tpu.ops.sliding_window import segmentation_from_probabilities
        predictor = self.get_sliding_window_predictor(
            do_mirroring=do_mirroring, step_size=step_size,
            use_gaussian=use_gaussian)
        probs = predictor(params if params is not None else self.state.params, data)
        seg = segmentation_from_probabilities(np.asarray(probs),
                                              self.regions_class_order)
        return seg, probs

    # --------------------------------------------------------------- validation
    def validate(self, do_mirroring: bool = True, use_sliding_window: bool = True,
                 step_size: float = 0.5, save_softmax: bool = True,
                 use_gaussian: bool = True, overwrite: bool = True,
                 validation_folder_name: str = "validation_raw", debug: bool = False,
                 all_in_gpu: bool = False, segmentation_export_kwargs: dict = None,
                 run_postprocessing_on_folds: bool = True):
        from multitalent_tpu.inference.validation import run_validation
        return run_validation(
            self, do_mirroring=do_mirroring, use_sliding_window=use_sliding_window,
            step_size=step_size, save_softmax=save_softmax, use_gaussian=use_gaussian,
            overwrite=overwrite, validation_folder_name=validation_folder_name,
            debug=debug, all_in_gpu=all_in_gpu,
            segmentation_export_kwargs=segmentation_export_kwargs,
            run_postprocessing_on_folds=run_postprocessing_on_folds)


@TRAINERS.register(aliases=("nnUNetTrainerV2_ResencUNet",
                            # SimonsInit = last-norm-of-each-residual-block scale
                            # initialized to 0 (nnUNetTrainerV2_ResencUNet_SimonsInit
                            # .py:26-35) — that init IS our BasicResidualBlock default
                            # (residual_unet.py norm2 zero scale), so the SimonsInit
                            # names resolve to the same trainer.
                            "nnUNetTrainerV2_ResencUNet_SimonsInit",
                            "nnUNetTrainerV2_ResencUNet_SimonsInit_20fold"))
class TrainerV2ResencUNet(TrainerV2):
    """Residual-encoder (FabiansUNet) trainer
    (nnUNet_variants/architectural_variants/nnUNetTrainerV2_ResencUNet.py parity):
    plans carry num_blocks_encoder/decoder and pool kernels with a leading [1,1,1]
    stage; deep-supervision scales skip that first entry."""

    def setup_DA_params(self) -> None:
        super().setup_DA_params()
        self.deep_supervision_scales = ds_scales_from_pools(
            self.net_num_pool_op_kernel_sizes[1:])

    def initialize_network(self) -> None:
        from multitalent_tpu.models.residual_unet import build_resenc_unet_from_plans
        self.network = build_resenc_unet_from_plans(
            self.plans, self.stage, deep_supervision=self.deep_supervision,
            dtype=jnp.bfloat16 if self.fp16 else jnp.float32,
            num_classes=self.num_classes)


# ----------------------------------------------------------- benchmark trainers
@TRAINERS.register(aliases=("nnUNetTrainerV2_2epochs",))
class TrainerV2_2epochs(TrainerV2):
    """Benchmarking trainer: 2 epochs, no validation inference, no checkpoints
    (nnUNet_variants/benchmarking/nnUNetTrainerV2_2epochs.py:27-77)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_num_epochs = 2
        self.save_final_checkpoint = False
        self.save_best_checkpoint = False
        self.save_intermediate_checkpoints = False

    def validate(self, *args, **kwargs):
        pass


@TRAINERS.register(aliases=("nnUNetTrainerV2_5epochs",))
class TrainerV2_5epochs(TrainerV2_2epochs):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_num_epochs = 5


class _DummyBatchGen:
    """Random-tensor generator isolating device throughput from host I/O
    (benchmarking/nnUNetTrainerV2_dummyLoad.py:26-84)."""

    def __init__(self, data_shape, seg_shape, num_classes, seed=0):
        rng = np.random.RandomState(seed)
        self.batch = {
            "data": rng.randn(*data_shape).astype(np.float32),
            "seg": rng.randint(0, num_classes, seg_shape).astype(np.float32),
            "properties": [{} for _ in range(data_shape[0])],
            "keys": ["dummy"] * data_shape[0],
        }

    def __next__(self):
        return self.batch

    def __iter__(self):
        return self


@TRAINERS.register(aliases=("nnUNetTrainerV2_5epochs_dummyLoad",))
class TrainerV2_dummyLoad(TrainerV2_5epochs):
    def initialize(self, training: bool = True, force_load_plans: bool = False) -> None:
        saved = self.dataset_directory
        self.dataset_directory = None  # skip real generators
        super().initialize(training, force_load_plans)
        self.dataset_directory = saved
        if training:
            data_shape = (self.batch_size, self.num_input_channels,
                          *self.basic_generator_patch_size)
            seg_shape = (self.batch_size, 1, *self.basic_generator_patch_size)
            self.tr_gen = _DummyBatchGen(data_shape, seg_shape, self.num_classes)
            val_shape = (self.batch_size, self.num_input_channels, *self.patch_size)
            val_seg = (self.batch_size, 1, *self.patch_size)
            self.val_gen = _DummyBatchGen(val_shape, val_seg, self.num_classes, seed=1)
