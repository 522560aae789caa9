"""Reproduce the reference's SHIPPED experiment artifacts from our own code.

The reference pins its entire flagship experiment in two pickles:
- MultiTalent_plans/MultiTalent_bs4_plans_3D.pkl (patch 96x192x192, pools
  [[2,2,2]x4,[1,2,2]], bs4, spacing (1.5,1,1), 2 stages)
- splits_custom.pkl (12 folds: 5 stitched CV folds + 7 leave-one-dataset-out)

These tests prove our planner and split builder REPRODUCE those artifacts:
the planner is fed the shipped dataset fingerprint (the pkl carries the full
1469-case `dataset_properties`) and must emit the same configuration; the
split builder is fed the per-task 5-fold splits recovered from the shipped
splits and must rebuild all 12 folds.
"""
import os
import pickle

import numpy as np
import pytest

PLANS_PKL = "/root/reference/MultiTalent_plans/MultiTalent_bs4_plans_3D.pkl"
RESENC_PKL = "/root/reference/MultiTalent_plans/MultiTalent_resenc_bs4_plans_3D.pkl"
SPLITS_PKL = "/root/reference/splits_custom.pkl"

pytestmark = pytest.mark.skipif(not os.path.isfile(PLANS_PKL),
                                reason="reference artifacts not present")


def _load(p):
    with open(p, "rb") as f:
        return pickle.load(f)


def test_multitalent_planner_reproduces_shipped_plans(tmp_path):
    from multitalent_tpu.planning.multitalent_planner import MultiTalentPlanner
    from multitalent_tpu.utils import save_pickle

    ref = _load(PLANS_PKL)
    cropped = tmp_path / "cropped"
    cropped.mkdir()
    save_pickle(ref["dataset_properties"], cropped / "dataset_properties.pkl")
    prep = tmp_path / "prep"
    prep.mkdir()

    planner = MultiTalentPlanner(str(cropped), str(prep))
    plans = planner.plan_experiment()

    assert plans["base_num_features"] == ref["base_num_features"] == 30
    assert plans["num_classes"] == ref["num_classes"] == 47
    assert plans["num_stages"] == ref["num_stages"] == 2
    assert [int(i) for i in plans["transpose_forward"]] == \
        [int(i) for i in ref["transpose_forward"]]
    assert plans["conv_per_stage"] == ref["conv_per_stage"]
    assert plans["normalization_schemes"] == ref["normalization_schemes"]

    for stage in (0, 1):
        ours, theirs = plans["plans_per_stage"][stage], ref["plans_per_stage"][stage]
        assert ours["batch_size"] == theirs["batch_size"] == 4, stage
        np.testing.assert_array_equal(ours["patch_size"], theirs["patch_size"])
        assert [list(p) for p in ours["pool_op_kernel_sizes"]] == \
            [list(p) for p in theirs["pool_op_kernel_sizes"]], stage
        assert [list(k) for k in ours["conv_kernel_sizes"]] == \
            [list(k) for k in theirs["conv_kernel_sizes"]], stage
        assert [int(i) for i in ours["num_pool_per_axis"]] == \
            [int(i) for i in theirs["num_pool_per_axis"]], stage
        np.testing.assert_allclose(ours["current_spacing"],
                                   theirs["current_spacing"], rtol=1e-9)
        np.testing.assert_array_equal(ours["median_patient_size_in_voxels"],
                                      theirs["median_patient_size_in_voxels"])
        assert bool(ours["do_dummy_2D_data_aug"]) == bool(theirs["do_dummy_2D_data_aug"])


def _recover_per_task_splits(splits):
    """Invert the stitching: per task, fold f's val cases (prefix stripped).
    Task046's genuinely-new PAN cases are excluded (they were dealt by seeded
    shuffle, not per-task splits); its 046_img* cases follow Task017."""
    per_task: dict = {}
    for f in range(5):
        for part in ("train", "val"):
            for k in splits[f][part]:
                tid = int(k[:3])
                if tid == 46:
                    continue
                case = k[4:]
                d = per_task.setdefault(tid, [
                    {"train": [], "val": []} for _ in range(5)])
                d[f][part].append(case)
    return per_task


def test_build_custom_splits_reproduces_shipped_splits():
    from multitalent_tpu.tasks.multitalent import build_custom_splits

    splits = _load(SPLITS_PKL)
    assert len(splits) == 12
    # The dataset key list the reference built the pickle from: folds 5-11
    # filter the ACTUAL dataset keys, while folds 0-4 are stitched from the
    # per-task splits_final files — which name 8 cases (006_lung_093, several
    # 062_pancreas_*) that were not in the dataset folder. Reconstruct the
    # true key list from fold 5 (everything but Task003) plus the Task003
    # cases present in fold 6.
    keys = sorted(set(splits[5]["train"])
                  | {k for k in splits[6]["train"] if k.startswith("003_")})

    per_task = _recover_per_task_splits(splits)
    rebuilt = build_custom_splits(keys, per_task, seed=1234)
    assert len(rebuilt) == 12
    for f in range(12):
        for part in ("train", "val"):
            assert sorted(rebuilt[f][part]) == sorted(splits[f][part]), \
                (f, part, len(rebuilt[f][part]), len(splits[f][part]))


def test_resenc_plans_fields_loadable_and_consistent():
    """The resenc plans add the residual block counts; our Plans loader must
    surface them for models/residual_unet.py."""
    from multitalent_tpu.plans import load_plans

    plans = load_plans(RESENC_PKL)
    st = plans.stage(1)
    assert st.num_blocks_encoder == (1, 2, 3, 4, 4, 4)
    assert st.num_blocks_decoder == (1, 1, 1, 1, 1)
    assert st.batch_size == 2  # bs4 is reached via --dbs over 2 GPUs
