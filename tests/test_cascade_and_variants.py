"""Cascade pipeline and trainer-variant tests."""
import numpy as np
import pytest

from multitalent_tpu.utils import save_pickle

from test_training import make_preprocessed, tiny_plans


def test_remove_random_component():
    from multitalent_tpu.training.cascade import remove_random_component
    seg = np.zeros((12, 12, 12), np.float32)
    seg[1:3, 1:3, 1:3] = 1  # small component (eligible)
    rng = np.random.RandomState(0)
    # force removal: p=1 always fires
    out = remove_random_component(seg, rng, p_per_label=1.0, max_coverage=0.5)
    assert out.sum() == 0
    # too-large components are never removed
    seg2 = np.zeros((4, 4, 4), np.float32)
    seg2[:] = 1
    out2 = remove_random_component(seg2, rng, p_per_label=1.0, max_coverage=0.15)
    assert out2.sum() == seg2.sum()


@pytest.mark.slow
def test_cascade_sampler_and_trainer(tmp_path):
    import jax
    from multitalent_tpu.training.cascade import (CascadePatchSampler3D,
                                                  TrainerV2CascadeFullRes)
    from multitalent_tpu.data.dataset import load_dataset

    dd = make_preprocessed(tmp_path, n_cases=4)
    folder = tmp_path / "mtt_data_stage0"
    # synth previous-stage segs
    for i in range(4):
        prev = np.zeros((1, 12, 12, 12), np.uint8)
        prev[0, 4:8, 4:8, 4:8] = 1
        np.savez_compressed(folder / f"case_{i:03d}_segFromPrevStage.npz",
                            data=prev)

    ds = load_dataset(str(folder))
    sampler = CascadePatchSampler3D(ds, (8, 8, 8), (8, 8, 8), 2, corrupt=True,
                                    oversample_foreground_percent=0.33, seed=0)
    batch = sampler.generate_train_batch()
    assert batch["seg"].shape == (2, 2, 8, 8, 8)  # [gt, prev] channels

    class ShortCascade(TrainerV2CascadeFullRes):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.max_num_epochs = 1
            self.num_batches_per_epoch = 2
            self.num_val_batches_per_epoch = 1

    t = ShortCascade(tiny_plans(), 0, str(tmp_path / "out"), dd)
    t.initialize(True)
    # network takes modalities + fg classes as input
    assert t.network.input_channels == 1 + 2
    t.run_training()
    assert np.isfinite(t.all_tr_losses).all()
    # cascade inference requires the extra channels
    vol = np.random.RandomState(0).randn(1, 10, 10, 10).astype(np.float32)
    with pytest.raises(AssertionError):
        t.predict_preprocessed_data_return_seg_and_softmax(vol)
    from multitalent_tpu.training.cascade import one_hot_prev_stage_channels
    prev = np.zeros((10, 10, 10), np.uint8)
    full = np.concatenate([vol, one_hot_prev_stage_channels(prev, 2)])
    seg, probs = t.predict_preprocessed_data_return_seg_and_softmax(
        full, do_mirroring=False)
    assert seg.shape == (10, 10, 10)
    assert probs.shape == (3, 10, 10, 10)


@pytest.mark.slow  # a full trainer compile per variant; registry resolution
def test_loss_variant_trainers_resolve_and_run(tmp_path):  # itself is covered
    _run_variant_trainers(tmp_path, ("nnUNetTrainerV2_Loss_CE",))  # fast in
    # test_core_contracts.py::test_registry / test_models.py, and a production
    # trainer iteration runs fast in test_training.py::test_trainer_grad_step_*


@pytest.mark.slow
def test_loss_variant_trainers_resolve_and_run_full(tmp_path):
    _run_variant_trainers(tmp_path, ("nnUNetTrainerV2_Adam",
                                     "nnUNetTrainerV2_noDA",
                                     "nnUNetTrainerV2_lReLU_convReLUIN"))


def _run_variant_trainers(tmp_path, names):
    from multitalent_tpu.registry import resolve_trainer
    dd = make_preprocessed(tmp_path)
    for name in names:
        cls = resolve_trainer(name)
        t = cls(tiny_plans(), 0, str(tmp_path / f"out_{name}"), dd)
        t.max_num_epochs = 1
        t.num_batches_per_epoch = 1
        t.num_val_batches_per_epoch = 1
        t.initialize(True)
        loss = t.run_iteration(t.tr_gen, True)
        assert np.isfinite(loss)
        t.tr_gen.stop()
        t.val_gen.stop()


@pytest.mark.slow  # another full trainer compile; no-DS forward itself is
def test_no_deep_supervision_trainer(tmp_path):  # covered in test_models
    from multitalent_tpu.registry import resolve_trainer
    dd = make_preprocessed(tmp_path)
    cls = resolve_trainer("nnUNetTrainerV2_noDeepSupervision")
    t = cls(tiny_plans(), 0, str(tmp_path / "out"), dd)
    t.max_num_epochs = 1
    t.num_batches_per_epoch = 1
    t.num_val_batches_per_epoch = 1
    t.initialize(True)
    loss = t.run_iteration(t.tr_gen, True)
    assert np.isfinite(loss)
    t.tr_gen.stop()
    t.val_gen.stop()


def test_conv_order_and_cascade_variants_resolve(tmp_path):
    """Round-2 additions: conv->nonlin->norm block order, resample33 export
    kwargs, V1 aliases, and the cascade DA-knob variants."""
    from multitalent_tpu.registry import resolve_trainer
    dd = make_preprocessed(tmp_path)
    # conv->nonlin->norm runs and produces an identical param tree shape
    cls = resolve_trainer("nnUNetTrainerV2_lReLU_convReLUIN")
    t = cls(tiny_plans(), 0, str(tmp_path / "out_order"), dd)
    t.max_num_epochs = 1
    t.num_batches_per_epoch = 1
    t.num_val_batches_per_epoch = 1
    t.initialize(True)
    assert t.network.nonlin_first
    t.tr_gen.stop()
    t.val_gen.stop()
    # aliases resolve to the consolidated V2 trainers
    assert resolve_trainer("nnUNetTrainerCE") is resolve_trainer(
        "nnUNetTrainerV2_Loss_CE")
    assert resolve_trainer("nnUNetTrainerNoDA") is resolve_trainer(
        "nnUNetTrainerV2_noDA")
    # cascade DA-knob variants configure the corruption parameters
    import multitalent_tpu.training.cascade  # noqa: F401  (registers variants)
    cls = resolve_trainer("nnUNetTrainerV2CascadeFullRes_EducatedGuess3")
    t = cls(tiny_plans(), 0, str(tmp_path / "out_eg3"), dd)
    t.load_plans_file()
    t.process_plans(t.plans)
    t.setup_DA_params()
    assert t.data_aug_params["cascade_random_binary_transform_p"] == 1.0
    assert t.data_aug_params[
        "cascade_random_binary_transform_p_per_label"] == 0.33
    cls = resolve_trainer("nnUNetTrainerV2CascadeFullRes_noConnComp")
    t = cls(tiny_plans(), 0, str(tmp_path / "out_ncc"), dd)
    t.load_plans_file()
    t.process_plans(t.plans)
    t.setup_DA_params()
    assert t.data_aug_params["cascade_remove_conn_comp_p"] == 0.0


@pytest.mark.slow
def test_new_optimizer_and_loss_variants_resolve_and_run(tmp_path):
    """Ranger (RAdam), cycleAtEnd joined schedule, MCC / squared-dice losses."""
    from multitalent_tpu.registry import resolve_trainer
    dd = make_preprocessed(tmp_path)
    for name in ("nnUNetTrainerV2_Ranger", "nnUNetTrainerV2_cycleAtEnd",
                 "nnUNetTrainerV2_Loss_MCC", "nnUNetTrainerV2_Loss_DC_CE_squared",
                 "nnUNetTrainerV2_momentum098"):
        cls = resolve_trainer(name)
        t = cls(tiny_plans(), 0, str(tmp_path / f"out_{name}"), dd)
        t.max_num_epochs = 1
        t.num_batches_per_epoch = 1
        t.num_val_batches_per_epoch = 1
        t.initialize(True)
        loss = t.run_iteration(t.tr_gen, True)
        assert np.isfinite(loss), name
        t.tr_gen.stop()
        t.val_gen.stop()
