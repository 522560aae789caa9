"""Trainer runtime tests: end-to-end tiny training, checkpoint resume, MultiTalent
trainer behavior, warmup phase switching, batch-size distribution policy."""
import numpy as np
import pytest

from multitalent_tpu.plans import Plans
from multitalent_tpu.preprocessing.preprocessor import sample_class_locations
from multitalent_tpu.utils import save_pickle


def tiny_plans(batch_size=2, patch=(8, 8, 8), num_classes=2, modalities=1):
    return Plans.from_dict({
        "num_stages": 1, "num_modalities": modalities,
        "modalities": {i: "CT" for i in range(modalities)},
        "normalization_schemes": {i: "CT" for i in range(modalities)},
        "num_classes": num_classes, "all_classes": list(range(1, num_classes + 1)),
        "base_num_features": 4, "use_mask_for_norm": {0: False},
        "transpose_forward": [0, 1, 2], "transpose_backward": [0, 1, 2],
        "data_identifier": "mtt_data",
        "dataset_properties": {"intensityproperties": {0: {
            "percentile_00_5": -3.0, "percentile_99_5": 3.0,
            "mean": 0.0, "sd": 1.0}}},
        "plans_per_stage": {0: {
            "batch_size": batch_size, "patch_size": patch,
            "current_spacing": (1.0, 1.0, 1.0), "original_spacing": (1.0, 1.0, 1.0),
            "median_patient_size_in_voxels": (16, 16, 16),
            "num_pool_per_axis": [1, 1, 1],
            "pool_op_kernel_sizes": [[2, 2, 2]],
            "conv_kernel_sizes": [[3, 3, 3]] * 2,
        }},
    })


def make_preprocessed(tmp_path, n_cases=6, shape=(12, 12, 12), prefix="case",
                      extra_props=None):
    folder = tmp_path / "mtt_data_stage0"
    folder.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n_cases):
        data = rng.standard_normal((1, *shape)).astype(np.float32)
        seg = np.zeros((1, *shape), np.float32)
        seg[0, 4:8, 4:8, 4:8] = 1
        seg[0, 5:7, 5:7, 5:7] = 2
        np.savez_compressed(folder / f"{prefix}_{i:03d}.npz",
                            data=np.concatenate([data, seg]))
        props = {"class_locations": sample_class_locations(seg[0], [1, 2])}
        if extra_props:
            props.update(extra_props)
        save_pickle(props, folder / f"{prefix}_{i:03d}.pkl")
    return str(tmp_path)


@pytest.fixture(scope="module")
def short_loop_cls():
    from multitalent_tpu.training.trainers import TrainerV2

    class ShortTrainer(TrainerV2):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.max_num_epochs = 2
            self.num_batches_per_epoch = 2
            self.num_val_batches_per_epoch = 1

    return ShortTrainer


@pytest.mark.slow
def test_trainer_v2_end_to_end(tmp_path, short_loop_cls):
    dd = make_preprocessed(tmp_path)
    plans = tiny_plans()
    t = short_loop_cls(plans, 0, str(tmp_path / "out"), dd)
    t.initialize(True)
    t.run_training()
    assert len(t.all_tr_losses) == 2
    assert len(t.all_val_eval_metrics) == 2
    assert np.isfinite(t.all_tr_losses).all()
    # resume from final checkpoint
    t2 = short_loop_cls(plans, 0, str(tmp_path / "out"), dd)
    t2.load_checkpoint(str(tmp_path / "out" / "fold_0" / "model_final_checkpoint.ckpt"))
    assert t2.epoch == 2
    assert int(t2.state.step) == 4
    # params equal bit-exact after round-trip
    import jax
    p1 = jax.device_get(t.state.params)
    p2 = jax.device_get(t2.state.params)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(a, b)


def test_trainer_grad_step_changes_params(tmp_path, short_loop_cls):
    dd = make_preprocessed(tmp_path)
    t = short_loop_cls(tiny_plans(), 0, str(tmp_path / "out"), dd)
    t.initialize(True)
    import jax
    before = jax.device_get(t.state.params)
    t.run_iteration(t.tr_gen, True)
    after = jax.device_get(t.state.params)
    changed = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(after)))
    assert changed
    t.tr_gen.stop()
    t.val_gen.stop()


@pytest.mark.slow
def test_multitalent_trainer_end_to_end(tmp_path):
    from multitalent_tpu.training.multitalent import MultiTalentTrainer

    dd = tmp_path
    # two source datasets with different region annotations
    make_preprocessed(tmp_path, n_cases=4, prefix="003",
                      extra_props={"valid_regions": ("03_liver", "03_cancer"),
                                   "valid_labels": [1, 2]})
    make_preprocessed(tmp_path, n_cases=2, prefix="009",
                      extra_props={"valid_regions": ("09_spleen",),
                                   "valid_labels": [8]})
    # pre-write a splits file (building it needs per-task splits on disk)
    keys = [f"003_{i:03d}" for i in range(4)] + [f"009_{i:03d}" for i in range(2)]
    save_pickle([{"train": keys, "val": keys}] * 12, tmp_path / "splits_custom.pkl")

    class ShortMT(MultiTalentTrainer):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.max_num_epochs = 1
            self.num_batches_per_epoch = 2
            self.num_val_batches_per_epoch = 1

    t = ShortMT(tiny_plans(), 0, str(tmp_path / "out"), str(dd))
    t.initialize(True)
    assert t.num_classes == 47
    t.run_training()
    assert len(t.all_tr_losses) == 1
    assert len(t.all_tr_ce) == 1 and np.isfinite(t.all_tr_ce[0])
    assert len(t.all_val_eval_metrics) == 1
    # online dice lives in [0, 1]
    assert 0.0 <= t.all_val_eval_metrics[0] <= 1.0


def test_multitalent_sampling_probabilities():
    from multitalent_tpu.tasks.multitalent import inverse_sqrt_sampling_probabilities
    keys = [f"003_{i}" for i in range(9)] + ["009_0"]
    p = inverse_sqrt_sampling_probabilities(keys)
    assert np.isclose(p.sum(), 1.0)
    # every 003 case has the same probability; the singleton dataset's case is
    # sqrt(9)=3x more likely than each 003 case
    assert np.allclose(p[:9], p[0])
    assert np.isclose(p[9] / p[0], 3.0)


def test_build_custom_splits():
    from multitalent_tpu.tasks.multitalent import build_custom_splits
    keys = [f"003_c{i}" for i in range(5)] + [f"064_c{i}" for i in range(5)]
    per_task = {
        3: [{"train": [f"c{j}" for j in range(5) if j != f], "val": [f"c{f}"]}
            for f in range(5)],
        64: [{"train": [f"c{j}" for j in range(5) if j != f], "val": [f"c{f}"]}
             for f in range(5)],
    }
    splits = build_custom_splits(keys, per_task)
    assert len(splits) == 12
    # fivefold: each fold's val holds one case per dataset, prefixed
    assert splits[0]["val"] == ["003_c0", "064_c0"]
    assert len(splits[0]["train"]) == 8
    # fold 5 excludes Task003, train == val
    assert all(not k.startswith("003_") for k in splits[5]["train"])
    assert splits[5]["train"] == splits[5]["val"]
    # fold 7 excludes Task064
    assert all(not k.startswith("064_") for k in splits[7]["train"])


def test_distribute_batch_size_policy():
    from multitalent_tpu.parallel import distribute_batch_size
    sizes, oversample = distribute_batch_size(4, 2)
    assert sizes == [2, 2]
    fr = oversample(0.33)
    # round(4*0.67)=3 -> global samples 3,4 forced -> shard0 none, shard1 one of two
    assert fr == [0.0, 0.5]
    sizes, _ = distribute_batch_size(5, 2)
    assert sizes == [3, 2]


@pytest.mark.slow
def test_warmup_seg_heads_phases(tmp_path):
    import jax
    from multitalent_tpu.training.warmup import TrainerV2WarmupSegHeads

    t = TrainerV2WarmupSegHeads(tiny_plans(), 0, str(tmp_path / "out"), None)
    t.initialize(True)  # no dataset_directory -> no generators, state only
    rng = jax.random.PRNGKey(0)
    data = np.random.RandomState(0).randn(
        2, 1, *t.basic_generator_patch_size).astype(np.float32)
    seg = np.zeros((2, 1, *t.basic_generator_patch_size), np.float32)
    before = jax.device_get(t.state.params)
    t.state, _, _ = t._train_step(t.state, rng, data, seg, {})
    after = jax.device_get(t.state.params)
    flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_a = jax.tree_util.tree_flatten_with_path(after)[0]
    for (path, b), (_, a) in zip(flat_b, flat_a):
        key = jax.tree_util.keystr(path)
        if "seg" in key:
            assert not np.array_equal(a, b), f"head {key} should have trained"
        else:
            np.testing.assert_array_equal(a, b, err_msg=f"backbone {key} moved in phase 1")
    # phase 2: backbone moves too
    t._switch_to_phase2()
    before = jax.device_get(t.state.params)
    t.state, _, _ = t._train_step(t.state, jax.random.PRNGKey(1), data, seg, {})
    after = jax.device_get(t.state.params)
    moved = sum(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(after)))
    assert moved > len(jax.tree_util.tree_leaves(before)) // 2


def test_poly_schedule_matches_reference_staircase():
    import jax.numpy as jnp
    from multitalent_tpu.training.schedules import make_poly_schedule, poly_lr
    sched = make_poly_schedule(1e-2, 1000, 250)
    assert np.isclose(float(sched(jnp.array(0))), poly_lr(0, 1000, 1e-2))
    assert np.isclose(float(sched(jnp.array(249))), poly_lr(0, 1000, 1e-2))
    assert np.isclose(float(sched(jnp.array(250))), poly_lr(1, 1000, 1e-2))
    assert np.isclose(float(sched(jnp.array(999 * 250))), poly_lr(999, 1000, 1e-2))


def test_task_tables_consistency():
    from multitalent_tpu.tasks import multitalent as mt
    mt.sanity_checks()
    m = mt.label_region_matrix()
    assert m.shape == (48, 47)
    # label 1 (liver wo cancer) belongs only to region 03_liver (channel 0)
    assert m[1].sum() == 1 and m[1, mt.REGION_OUTPUT_IDX["03_liver"]] == 1
    # label 2 (liver tumor) belongs to 03_liver and 03_cancer
    assert m[2].sum() == 2
    # label 43 (kidney tumor) belongs to 64_both_kidneys and 64_kidney_tumor
    assert m[43].sum() == 2
    # conversion kernel
    seg = np.array([0, 1, 2, 1])
    out = mt.convert_source_segmentation(seg, "Task007_Pancreas")
    np.testing.assert_array_equal(out, [0, 4, 5, 4])
    with pytest.raises(ValueError):
        mt.convert_source_segmentation(np.array([3]), "Task007_Pancreas")
    props = mt.attach_region_annotations({}, "009_spleen_07")
    assert props["valid_regions"] == ("09_spleen",)
    assert props["valid_labels"] == [8]


@pytest.mark.slow
def test_trainer_2d_path(tmp_path, short_loop_cls):
    """2D configuration: PatchSampler2D + 2D augmentation + 2D GenericUNet."""
    dd = make_preprocessed(tmp_path, shape=(8, 24, 24))
    plans = tiny_plans()
    d = plans.to_dict()
    d["plans_per_stage"] = {0: {
        "batch_size": 4, "patch_size": (16, 16),
        "current_spacing": (3.0, 1.0, 1.0), "original_spacing": (3.0, 1.0, 1.0),
        "median_patient_size_in_voxels": (8, 24, 24),
        "num_pool_per_axis": [2, 2],
        "pool_op_kernel_sizes": [[2, 2], [2, 2]],
        "conv_kernel_sizes": [[3, 3]] * 3,
    }}
    from multitalent_tpu.plans import Plans
    t = short_loop_cls(Plans.from_dict(d), 0, str(tmp_path / "out2d"), dd)
    t.max_num_epochs = 1
    t.initialize(True)
    assert not t.threeD
    t.run_training()
    assert np.isfinite(t.all_tr_losses).all()


def test_2d_planner_on_synthetic_fingerprint(tmp_path):
    """ExperimentPlanner2D_v21 produces a single-stage 2D plan."""
    from multitalent_tpu.planning.experiment_planner import ExperimentPlanner2Dv21
    from multitalent_tpu.utils import save_pickle
    cropped = tmp_path / "cropped"
    cropped.mkdir()
    rng = np.random.default_rng(0)
    sizes = [[40, 192, 192]] * 6
    spacings = [[3.0, 0.8, 0.8]] * 6
    props = {
        "all_sizes": sizes, "all_spacings": spacings,
        "all_classes": [1, 2], "modalities": {0: "CT"},
        "size_reductions": {f"c{i}": 1.0 for i in range(6)},
        "intensityproperties": {0: {"percentile_00_5": -100.0,
                                    "percentile_99_5": 200.0,
                                    "mean": 50.0, "sd": 30.0}},
    }
    save_pickle(props, cropped / "dataset_properties.pkl")
    # planner scans npz files for the 5%-coverage rule; fake minimal entries
    for i in range(6):
        np.savez_compressed(cropped / f"c{i}.npz", data=np.zeros((1, 1, 1, 1)))
        save_pickle({}, cropped / f"c{i}.pkl")
    out = tmp_path / "preproc"
    out.mkdir()
    planner = ExperimentPlanner2Dv21(str(cropped), str(out))
    plans = planner.plan_experiment()
    assert plans["num_stages"] == 1
    st = plans["plans_per_stage"][0]
    assert len(st["patch_size"]) == 2
    assert st["batch_size"] >= 2
    assert all(len(k) == 2 for k in st["pool_op_kernel_sizes"])
