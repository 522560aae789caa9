import os
from pathlib import Path

import numpy as np
import pytest

from multitalent_tpu import paths
from multitalent_tpu.plans import Plans, StagePlans, load_plans, save_plans

REF_PLANS = Path("/root/reference/MultiTalent_plans/MultiTalent_bs4_plans_3D.pkl")


def test_paths_env(tmp_path, monkeypatch):
    monkeypatch.setenv("nnUNet_raw_data_base", str(tmp_path / "raw"))
    monkeypatch.setenv("nnUNet_preprocessed", str(tmp_path / "prep"))
    monkeypatch.setenv("RESULTS_FOLDER", str(tmp_path / "res"))
    assert paths.nnUNet_raw_data().endswith("nnUNet_raw_data")
    assert os.path.isdir(paths.nnUNet_cropped_data())
    assert os.path.isdir(paths.preprocessing_output_dir())
    assert paths.network_training_output_dir().endswith("nnUNet")


@pytest.mark.skipif(not REF_PLANS.exists(), reason="reference plans not available")
def test_load_reference_plans_pickle():
    plans = load_plans(REF_PLANS)
    assert plans.num_classes == 47
    assert plans.num_modalities == 1
    assert plans.modalities[0] == "CT"
    assert plans.base_num_features == 30
    st = plans.stage(1)
    assert st.patch_size == (96, 192, 192)
    assert st.batch_size == 4
    assert st.pool_op_kernel_sizes == [[2, 2, 2]] * 4 + [[1, 2, 2]]
    assert st.conv_kernel_sizes == [[3, 3, 3]] * 6
    assert st.current_spacing == (1.5, 1.0, 1.0)


def test_plans_roundtrip(tmp_path):
    stage = StagePlans(
        batch_size=2,
        patch_size=(40, 56, 40),
        current_spacing=(1.0, 1.0, 1.0),
        original_spacing=(1.0, 1.0, 1.0),
        median_patient_size_in_voxels=(36, 50, 35),
        num_pool_per_axis=[3, 3, 3],
        pool_op_kernel_sizes=[[2, 2, 2]] * 3,
        conv_kernel_sizes=[[3, 3, 3]] * 4,
    )
    plans = Plans(
        num_stages=1,
        num_modalities=1,
        modalities={0: "MRI"},
        normalization_schemes={0: "nonCT"},
        num_classes=2,
        all_classes=[1, 2],
        base_num_features=32,
        use_mask_for_norm={0: True},
        transpose_forward=[0, 1, 2],
        transpose_backward=[0, 1, 2],
        data_identifier="TestData",
        plans_per_stage={0: stage},
    )
    p = tmp_path / "plans.pkl"
    save_plans(plans, p)
    loaded = load_plans(p)
    assert loaded.num_classes == 2
    assert loaded.stage(0).patch_size == (40, 56, 40)
    assert loaded.stage(0).pool_op_kernel_sizes == [[2, 2, 2]] * 3
    np.testing.assert_array_equal(loaded.transpose_forward, [0, 1, 2])


def test_registry():
    from multitalent_tpu.registry import Registry

    reg = Registry("thing")

    @reg.register(aliases=("OldName",))
    class A:
        pass

    assert reg.get("A") is A
    assert reg.get("OldName") is A
    with pytest.raises(KeyError):
        reg.get("B")


def test_bench_strip_accel_site():
    """The bench CPU-fallback re-exec must drop the accelerator plugin's
    site dir from PYTHONPATH: its sitecustomize blocks interpreter startup
    on a wedged relay even under JAX_PLATFORMS=cpu."""
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from bench import _strip_accel_site
    sep = os.pathsep
    assert _strip_accel_site(f"/root/.axon_site{sep}/opt/lib") == "/opt/lib"
    assert _strip_accel_site("/root/.axon_site") == ""
    assert _strip_accel_site(f"{sep}/a{sep}{sep}/b{sep}") == f"/a{sep}/b"
    assert _strip_accel_site("") == ""
