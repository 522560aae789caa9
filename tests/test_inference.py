"""Inference stack tests: segmentation export, evaluation, postprocessing,
trainer validation, folder prediction with fold ensembling."""
import numpy as np
import pytest

from multitalent_tpu.io.nifti import Geometry, read_nifti, write_nifti
from multitalent_tpu.utils import save_pickle

from test_training import make_preprocessed, tiny_plans


def full_properties(shape=(12, 12, 12)):
    return {
        "original_spacing": np.array([1.0, 1.0, 1.0]),
        "itk_spacing": (1.0, 1.0, 1.0),
        "itk_origin": (0.0, 0.0, 0.0),
        "itk_direction": (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
        "size_after_cropping": shape,
        "spacing_after_resampling": np.array([1.0, 1.0, 1.0]),
        "crop_bbox": [[0, shape[0]], [0, shape[1]], [0, shape[2]]],
        "shape_before_cropping": shape,
        "transpose_backward": [0, 1, 2],
    }


def test_export_argmax_roundtrip(tmp_path):
    from multitalent_tpu.inference.segmentation_export import (
        save_segmentation_nifti_from_softmax)
    shape = (6, 7, 8)
    probs = np.zeros((3, *shape), np.float32)
    probs[0] = 0.6
    probs[1, 2:4] = 0.9
    probs[2, 5:] = 0.95
    out = str(tmp_path / "seg.nii.gz")
    save_segmentation_nifti_from_softmax(probs, out, full_properties(shape))
    seg, geom = read_nifti(out)
    assert seg.shape == shape
    assert set(np.unique(seg)) == {0, 1, 2}
    assert (seg[2:4] == 1).all()
    assert (seg[5:] == 2).all()
    np.testing.assert_allclose(geom.spacing, (1, 1, 1))


def test_export_uncrop_and_resample(tmp_path):
    from multitalent_tpu.inference.segmentation_export import (
        save_segmentation_nifti_from_softmax)
    # preprocessed grid 8^3, cropped grid 12^3 (resample back), original 16^3 (uncrop)
    props = full_properties((12, 12, 12))
    props["crop_bbox"] = [[2, 14], [2, 14], [2, 14]]
    props["shape_before_cropping"] = (16, 16, 16)
    props["original_spacing"] = np.array([1.5, 1.5, 1.5])
    probs = np.zeros((2, 8, 8, 8), np.float32)
    probs[0] = 1.0
    probs[1, 2:6, 2:6, 2:6] = 0.9  # foreground cube in the center
    probs[0, 2:6, 2:6, 2:6] = 0.1
    out = str(tmp_path / "seg.nii.gz")
    save_segmentation_nifti_from_softmax(probs, out, props)
    seg, _ = read_nifti(out)
    assert seg.shape == (16, 16, 16)
    assert seg.sum() > 0
    # outside the crop bbox everything is background
    assert seg[:2].sum() == 0 and seg[14:].sum() == 0


def test_export_region_mode(tmp_path):
    from multitalent_tpu.inference.segmentation_export import (
        save_segmentation_nifti_from_softmax)
    shape = (6, 6, 6)
    probs = np.zeros((2, *shape), np.float32)
    probs[0, :3] = 0.9
    probs[1, 2:4] = 0.8
    out = str(tmp_path / "seg.nii.gz")
    save_segmentation_nifti_from_softmax(probs, out, full_properties(shape),
                                         region_class_order=(4, 7))
    seg, _ = read_nifti(out)
    assert set(np.unique(seg)) <= {0, 4, 7}
    assert (seg[2:4] == 7).all()  # later region overwrites


def test_evaluator_and_aggregate(tmp_path):
    from multitalent_tpu.evaluation.evaluator import (NiftiEvaluator,
                                                      aggregate_scores)
    shape = (8, 8, 8)
    gt = np.zeros(shape, np.uint8)
    gt[2:6, 2:6, 2:6] = 1
    pred = np.zeros(shape, np.uint8)
    pred[3:6, 2:6, 2:6] = 1  # 3/4 overlap in z
    g = Geometry()
    write_nifti(tmp_path / "gt" / "c.nii.gz", gt, g)
    write_nifti(tmp_path / "pred" / "c.nii.gz", pred, g)
    scores = aggregate_scores(
        [(str(tmp_path / "pred" / "c.nii.gz"), str(tmp_path / "gt" / "c.nii.gz"))],
        labels=[1], evaluator=NiftiEvaluator, num_threads=1,
        json_output_file=str(tmp_path / "summary.json"))
    dice = scores["mean"]["1"]["Dice"]
    expected = 2 * 48 / (48 + 64)
    assert np.isclose(dice, expected)
    assert (tmp_path / "summary.json").exists()


def test_aggregate_scores_threaded_no_shared_evaluator(tmp_path, monkeypatch):
    """Regression: aggregate_scores used to hand the SAME Evaluator instance to
    every pool worker; under the thread-pool fallback (active once a JAX
    backend exists) concurrent set_test/set_reference raced and a case could be
    scored against another case's arrays. Force the thread pool and check every
    case's per-case Dice is the one its own pair implies."""
    from concurrent.futures import ThreadPoolExecutor

    from multitalent_tpu.evaluation import evaluator as ev

    monkeypatch.setattr(ev, "process_pool",
                        lambda n: ThreadPoolExecutor(max_workers=n))
    shape = (8, 8, 8)
    g = Geometry()
    pairs = []
    expected = {}
    gt = np.zeros(shape, np.uint8)
    gt[2:6, 2:6, 2:6] = 1  # 64 voxels
    for i in range(8):
        pred = np.zeros(shape, np.uint8)
        pred[2:6, 2:6, 2:6] = 1
        # erode i voxels -> per-case dice 2*(64-i)/(128-i), all distinct
        idx = np.argwhere(pred == 1)[:i]
        if i:
            pred[tuple(idx.T)] = 0
        write_nifti(tmp_path / "gt" / f"c{i}.nii.gz", gt, g)
        write_nifti(tmp_path / "pred" / f"c{i}.nii.gz", pred, g)
        t = str(tmp_path / "pred" / f"c{i}.nii.gz")
        r = str(tmp_path / "gt" / f"c{i}.nii.gz")
        pairs.append((t, r))
        expected[t] = 2 * (64 - i) / (128 - i)
    for _ in range(3):  # racy bug reproduced within a try or two pre-fix
        scores = ev.aggregate_scores(pairs, labels=[1], num_threads=4)
        for case in scores["all"]:
            assert np.isclose(case["1"]["Dice"], expected[case["test"]])


def test_surface_metrics():
    from multitalent_tpu.evaluation.metrics import (avg_surface_distance,
                                                    hausdorff_distance,
                                                    hausdorff_distance_95)
    a = np.zeros((10, 10, 10), bool)
    b = np.zeros((10, 10, 10), bool)
    a[2:5, 2:5, 2:5] = True
    b[2:5, 2:5, 2:5] = True
    assert hausdorff_distance(a, b) == 0.0
    assert avg_surface_distance(a, b) == 0.0
    b2 = np.zeros_like(b)
    b2[3:6, 2:5, 2:5] = True  # shifted by 1 in z
    assert 0 < hausdorff_distance(a, b2) <= 2.0
    assert np.isnan(hausdorff_distance_95(a, np.zeros_like(b)))


def test_largest_cc_removal():
    from multitalent_tpu.postprocessing.connected_components import (
        remove_all_but_the_largest_connected_component)
    img = np.zeros((10, 10, 10), np.int32)
    img[1:5, 1:5, 1:5] = 1          # big blob: 64 voxels
    img[7:9, 7:9, 7:9] = 1          # small blob: 8 voxels
    out, removed, kept = remove_all_but_the_largest_connected_component(
        img.copy(), [1], 1.0)
    assert out[7:9, 7:9, 7:9].sum() == 0
    assert out[1:5, 1:5, 1:5].sum() == 64
    assert removed[1] == 8.0 and kept[1] == 64.0
    # joint-region mode
    img2 = np.zeros((10, 10, 10), np.int32)
    img2[1:5, 1:5, 1:5] = 1
    img2[7:9, 7:9, 7:9] = 2
    out2, _, _ = remove_all_but_the_largest_connected_component(
        img2.copy(), [(1, 2)], 1.0)
    assert out2[7:9, 7:9, 7:9].sum() == 0  # smaller joint component removed


def test_determine_postprocessing(tmp_path):
    from multitalent_tpu.postprocessing.connected_components import (
        determine_postprocessing, load_postprocessing)
    g = Geometry()
    base = tmp_path / "model"
    raw = base / "validation_raw"
    gt_dir = tmp_path / "gt"
    rng = np.random.RandomState(0)
    for i in range(3):
        gt = np.zeros((12, 12, 12), np.uint8)
        gt[2:7, 2:7, 2:7] = 1
        pred = gt.copy()
        pred[9:11, 9:11, 9:11] = 1  # spurious blob -> CC removal helps
        write_nifti(gt_dir / f"case_{i}.nii.gz", gt, g)
        write_nifti(raw / f"case_{i}.nii.gz", pred, g)
    determine_postprocessing(str(base), str(gt_dir), "validation_raw",
                             processes=1, debug=False)
    assert (base / "postprocessing.json").exists()
    for_which, min_valid = load_postprocessing(str(base / "postprocessing.json"))
    assert len(for_which) > 0  # postprocessing was selected
    assert (base / "validation_final" / "case_0.nii.gz").exists()
    out, _ = read_nifti(str(base / "validation_final" / "case_0.nii.gz"))
    assert out[9:11, 9:11, 9:11].sum() == 0  # blob removed


@pytest.fixture(scope="module")
def trained_tiny(tmp_path_factory):
    """One tiny trained TrainerV2 checkpoint shared across inference tests."""
    from multitalent_tpu.training.trainers import TrainerV2

    tmp_path = tmp_path_factory.mktemp("trained")
    dd = make_preprocessed(tmp_path, extra_props=full_properties())
    # ground-truth niftis for validation scoring
    import os
    gt_dir = tmp_path / "gt_segmentations"
    g = Geometry()
    folder = tmp_path / "mtt_data_stage0"
    for f in sorted(os.listdir(folder)):
        if f.endswith(".npz"):
            case = f[:-4]
            seg = np.load(folder / f)["data"][-1]
            write_nifti(gt_dir / f"{case}.nii.gz", np.maximum(seg, 0).astype(np.uint8), g)

    class Short(TrainerV2):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.max_num_epochs = 1
            self.num_batches_per_epoch = 2
            self.num_val_batches_per_epoch = 1

    plans = tiny_plans()
    t = Short(plans, 0, str(tmp_path / "out"), dd)
    t.initialize(True)
    t.run_training()
    return t, tmp_path


@pytest.mark.slow  # full validate() = another sliding-window compile; the
def test_validate_end_to_end(trained_tiny):  # cheaper predict_from_folder keeps fast coverage
    import os
    t, tmp_path = trained_tiny
    summary = t.validate(save_softmax=False, run_postprocessing_on_folds=True)
    val_dir = os.path.join(t.output_folder, "validation_raw")
    exported = [f for f in os.listdir(val_dir) if f.endswith(".nii.gz")]
    assert len(exported) == len(t.dataset_val)
    assert summary is not None
    assert os.path.isfile(os.path.join(t.output_folder, "postprocessing.json"))


def test_predict_from_folder(trained_tiny):
    import os
    from multitalent_tpu.inference.predict import predict_from_folder
    t, tmp_path = trained_tiny
    # write raw input niftis following the _0000 convention
    raw = tmp_path / "raw_input"
    g = Geometry()
    rng = np.random.RandomState(0)
    for i in range(2):
        vol = rng.standard_normal((12, 12, 12)).astype(np.float32) + 100
        write_nifti(raw / f"pat{i}_0000.nii.gz", vol, g)
    # model folder must carry plans.pkl for modality discovery
    from multitalent_tpu.plans import save_plans
    model_dir = str(tmp_path / "out")
    save_plans(t.plans, os.path.join(model_dir, "plans.pkl"))
    out_dir = str(tmp_path / "pred_out")
    predict_from_folder(model_dir, str(raw), out_dir, folds=[0], tta=False,
                        num_threads_preprocessing=1, num_threads_nifti_save=1)
    preds = [f for f in os.listdir(out_dir) if f.endswith(".nii.gz")]
    assert sorted(preds) == ["pat0.nii.gz", "pat1.nii.gz"]
    seg, _ = read_nifti(os.path.join(out_dir, "pat0.nii.gz"))
    assert seg.shape == (12, 12, 12)


def test_pretrained_table_and_multitalent_fixups(tmp_path, monkeypatch):
    """Full 27-entry zoo table + the released-zip fixups: folder level added,
    typo'd trainer dir renamed, sidecar pkl trainer names rewritten."""
    import pickle
    from multitalent_tpu.inference import pretrained_models as pm

    assert len(pm.AVAILABLE_MODELS) == 27
    assert "Task100_MultiTalent" in pm.AVAILABLE_MODELS
    assert "zenodo" in str(pm.AVAILABLE_MODELS["Task100_MultiTalent"]["url"])

    out = tmp_path / "results"
    bad = out / "Task100_MultiTalent" / \
        "MultiTalent_tainer_resenc_ddp__MultiTalent_resenc_bs4" / "fold_0"
    bad.mkdir(parents=True)
    with open(bad / "model_final_checkpoint.model.pkl", "wb") as f:
        pickle.dump({"name": "MultiTalent_tainer_resenc_ddp", "init": ()}, f)
    pm._apply_multitalent_fixups(str(out))
    fixed = out / "3d_fullres" / "Task100_MultiTalent" / \
        "MultiTalent_trainer_resenc_ddp_2000ep__MultiTalent_resenc_bs4" / "fold_0"
    assert fixed.is_dir()
    assert not (out / "Task100_MultiTalent").exists()
    with open(fixed / "model_final_checkpoint.model.pkl", "rb") as f:
        meta = pickle.load(f)
    assert meta["name"] == "MultiTalent_trainer_resenc_ddp_2000ep"
