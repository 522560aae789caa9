from pathlib import Path

import numpy as np
import pytest

from multitalent_tpu.planning import net_topology as nt
from multitalent_tpu.utils import load_pickle

REF_PLANS = Path("/root/reference/MultiTalent_plans/MultiTalent_bs4_plans_3D.pkl")


def test_pad_shape():
    np.testing.assert_array_equal(nt.pad_shape([96, 190, 190], [16, 32, 32]), [96, 192, 192])
    np.testing.assert_array_equal(nt.pad_shape([96, 192, 192], [16, 32, 32]), [96, 192, 192])


def test_get_pool_and_conv_props_isotropic():
    npool, pools, convs, padded, must_div = nt.get_pool_and_conv_props(
        (1.0, 1.0, 1.0), [128, 128, 128], 4, 999)
    assert npool == [5, 5, 5]
    assert pools == [[2, 2, 2]] * 5
    assert convs == [[3, 3, 3]] * 6
    np.testing.assert_array_equal(padded, [128, 128, 128])


def test_get_pool_and_conv_props_anisotropic():
    # 1.5mm z vs 1mm in-plane: z pooled one time less, first conv still 3 (within 2x)
    npool, pools, convs, padded, _ = nt.get_pool_and_conv_props(
        (1.5, 1.0, 1.0), [96, 192, 192], 4, 999)
    assert npool == [4, 5, 5]
    assert pools == [[2, 2, 2]] * 4 + [[1, 2, 2]]
    assert convs == [[3, 3, 3]] * 6


def test_get_pool_and_conv_props_strong_aniso_kernel():
    # 5mm z: first convs should be 1 on z until spacing catches up
    npool, pools, convs, padded, _ = nt.get_pool_and_conv_props(
        (5.0, 1.0, 1.0), [32, 256, 256], 4, 999)
    assert convs[0] == [1, 3, 3]
    assert pools[0] == [1, 2, 2]
    assert 3 in [c[0] for c in convs]  # eventually becomes 3


def test_memory_proxy_monotone():
    a = nt.compute_memory_proxy([96, 192, 192], [4, 5, 5], 30, 320, 1, 48,
                                [[2, 2, 2]] * 4 + [[1, 2, 2]])
    b = nt.compute_memory_proxy([96, 160, 160], [4, 5, 5], 30, 320, 1, 48,
                                [[2, 2, 2]] * 4 + [[1, 2, 2]])
    assert a > b > 0


@pytest.mark.skipif(not REF_PLANS.exists(), reason="reference plans not available")
class TestMultiTalentPlannerParity:
    """Feed the shipped MultiTalent fingerprint through our planner and check it makes
    the same decisions as the shipped plans file (patch, pooling, convs, batch size)."""

    def _planner_and_ref(self):
        from multitalent_tpu.planning.multitalent_planner import MultiTalentPlanner

        ref = load_pickle(REF_PLANS)
        planner = MultiTalentPlanner.__new__(MultiTalentPlanner)
        # minimal init without filesystem
        planner.unet_base_num_features = 30
        planner.unet_max_num_filters = 320
        planner.unet_max_numpool = 999
        planner.unet_min_batch_size = 2
        planner.unet_featuremap_min_edge_length = 4
        planner.target_spacing_percentile = 50
        planner.anisotropy_threshold = 3
        planner.batch_size_covers_max_percent_of_dataset = 0.05
        planner.conv_per_stage = 2
        planner.fixed_batch_size = 4
        planner.dataset_properties = ref["dataset_properties"]
        return planner, ref

    def test_fullres_stage(self):
        planner, ref = self._planner_and_ref()
        target = planner.get_target_spacing()
        np.testing.assert_array_equal(target, [1.5, 1.0, 1.0])

        spacings = ref["dataset_properties"]["all_spacings"]
        sizes = ref["dataset_properties"]["all_sizes"]
        new_shapes = [np.array(sp) / target * np.array(sz) for sp, sz in zip(spacings, sizes)]
        median_shape = np.median(np.vstack(new_shapes), 0)
        tf = ref["transpose_forward"]
        num_cases = len(ref["list_of_npz_files"])

        stage = planner.get_properties_for_stage(
            np.array(target)[tf], np.array(target)[tf], np.array(median_shape)[tf],
            num_cases, ref["num_modalities"], ref["num_classes"] + 1)

        expect = ref["plans_per_stage"][1]
        np.testing.assert_array_equal(stage["patch_size"], expect["patch_size"])
        assert stage["pool_op_kernel_sizes"] == expect["pool_op_kernel_sizes"]
        assert stage["conv_kernel_sizes"] == expect["conv_kernel_sizes"]
        assert stage["num_pool_per_axis"] == expect["num_pool_per_axis"]
        assert stage["batch_size"] == 4
        np.testing.assert_array_equal(stage["median_patient_size_in_voxels"],
                                      expect["median_patient_size_in_voxels"])

    def test_lowres_stage(self):
        planner, ref = self._planner_and_ref()
        target = planner.get_target_spacing()
        spacings = ref["dataset_properties"]["all_spacings"]
        sizes = ref["dataset_properties"]["all_sizes"]
        new_shapes = [np.array(sp) / target * np.array(sz) for sp, sz in zip(spacings, sizes)]
        median_shape_t = np.median(np.vstack(new_shapes), 0)[ref["transpose_forward"]]

        expect = ref["plans_per_stage"][0]
        stage = planner.get_properties_for_stage(
            expect["current_spacing"], expect["original_spacing"], median_shape_t,
            len(ref["list_of_npz_files"]), ref["num_modalities"], ref["num_classes"] + 1)
        np.testing.assert_array_equal(stage["patch_size"], expect["patch_size"])
        assert stage["pool_op_kernel_sizes"] == expect["pool_op_kernel_sizes"]
        np.testing.assert_array_equal(stage["median_patient_size_in_voxels"],
                                      expect["median_patient_size_in_voxels"])
