"""Model-selection / ensembling path: find_best_configuration picks the right
winner from synthetic CV folders, builds + scores the pairwise ensemble, and
determines postprocessing; plus a numeric ensemble_predictions test.

Parity target: figure_out_what_to_submit.py:47-134 semantics (rank configs by
CV mean foreground Dice incl. ensembles, winner's postprocessing, final
command string) and ensemble_predictions.py:26-98 (softmax averaging).
"""
from __future__ import annotations

import os

import numpy as np

from multitalent_tpu.io.nifti import Geometry, read_nifti, write_nifti
from multitalent_tpu.utils import save_pickle
from multitalent_tpu.utils.fileops import load_json, save_json

from test_inference import full_properties

SHAPE = (8, 9, 10)
TASK = "Task097_Synth"
TRAINER_DIR = "TrainerV2__MTTPUPlansv2.1"


def _gt_seg(case_idx: int) -> np.ndarray:
    seg = np.zeros(SHAPE, np.uint8)
    seg[2:5, 2:6, 2 + case_idx:7] = 1
    seg[5:7, 6:8, 1:4] = 2
    return seg


def _softmax_for(seg: np.ndarray, correct: float) -> np.ndarray:
    """3-class softmax that argmaxes to `seg` with prob `correct`, spreading
    the remainder over the other classes."""
    probs = np.full((3, *seg.shape), (1 - correct) / 2, np.float32)
    for c in range(3):
        probs[c][seg == c] = correct
    return probs


def _write_validation(model_dir: str, cases, quality: dict[int, float],
                      confidence: float = 0.9):
    """fold_0/validation_raw with predictions whose per-class quality is
    controlled by flipping a block of voxels to the wrong label.

    `confidence` is the softmax mass on the predicted class. The two models in
    the find_best_configuration test use DIFFERENT confidences (0.9 vs 0.8) so
    the ensemble average has no exact argmax ties on disputed voxels — with
    equal confidences a disputed voxel ties 0.475/0.475 and argmax tie-breaking
    lands on background, making `2d <= ensemble` false in general."""
    vdir = os.path.join(model_dir, "fold_0", "validation_raw")
    os.makedirs(vdir, exist_ok=True)
    g = Geometry()
    for i in cases:
        seg = _gt_seg(i)
        pred = seg.copy()
        n_wrong = quality[i]
        if n_wrong:
            # corrupt the first n_wrong voxels of class 1 to background
            idx = np.argwhere(pred == 1)[:n_wrong]
            pred[tuple(idx.T)] = 0
        write_nifti(os.path.join(vdir, f"case{i}.nii.gz"), pred, g)
        np.savez_compressed(
            os.path.join(vdir, f"case{i}.npz"),
            softmax=_softmax_for(pred, confidence).astype(np.float16))
        save_pickle(full_properties(SHAPE),
                    os.path.join(vdir, f"case{i}.pkl"))


def _setup_task(tmp_path, monkeypatch):
    prep = tmp_path / "prep" / TASK
    (prep / "gt_segmentations").mkdir(parents=True)
    g = Geometry()
    for i in range(3):
        write_nifti(prep / "gt_segmentations" / f"case{i}.nii.gz",
                    _gt_seg(i), g)
    save_json({"labels": {"0": "bg", "1": "organ", "2": "lesion"},
               "modality": {"0": "CT"}}, str(prep / "dataset.json"))
    monkeypatch.setenv("nnUNet_preprocessed", str(tmp_path / "prep"))
    monkeypatch.setenv("RESULTS_FOLDER", str(tmp_path / "results"))
    from multitalent_tpu import paths
    return paths.network_training_output_dir()


def test_find_best_configuration_picks_winner(tmp_path, monkeypatch, capsys):
    from multitalent_tpu.cli.find_best_configuration import main as fbc_main
    from multitalent_tpu import paths

    base = _setup_task(tmp_path, monkeypatch)
    # 3d_fullres: perfect predictions; 2d: degraded class-1 predictions
    good = os.path.join(base, "3d_fullres", TASK, TRAINER_DIR)
    bad = os.path.join(base, "2d", TASK, TRAINER_DIR)
    # asymmetric confidences: on voxels where the models disagree, the good
    # model's 0.9 beats the bad model's 0.8 in the softmax mean, so the
    # ensemble argmax equals the good prediction everywhere by construction
    # (no 0.475/0.475 background ties) and 2d <= ensemble <= 3d_fullres holds.
    _write_validation(good, range(3), {i: 0 for i in range(3)}, confidence=0.9)
    _write_validation(bad, range(3), {i: 12 for i in range(3)}, confidence=0.8)

    fbc_main(["-t", TASK, "-f", "0", "-m", "2d", "3d_fullres"])

    sel = load_json(os.path.join(base, f"model_selection_{TASK}.json"))
    assert sel["best"] == "3d_fullres"
    assert sel["results"]["3d_fullres"] > sel["results"]["2d"]
    # the pairwise ensemble was built and scored (between the two: its
    # softmax average argmaxes to a mix, scoring between bad and good)
    ens_key = "ensemble_2d__3d_fullres"
    assert ens_key in sel["results"]
    assert sel["results"]["2d"] <= sel["results"][ens_key] <= \
        sel["results"]["3d_fullres"] + 1e-9
    ens_dir = os.path.join(base, "ensembles", TASK, ens_key)
    assert os.path.isfile(os.path.join(ens_dir, "summary.json"))
    # winner postprocessing was determined on its cv folder
    assert os.path.isfile(os.path.join(good, "postprocessing.json"))
    # final command string printed
    out = capsys.readouterr().out
    assert "Best configuration: 3d_fullres" in out
    assert "mttpu_predict" in out


def test_ensemble_predictions_numeric(tmp_path):
    """Averaging is exact: argmax of the MEAN softmax, not a vote — a case
    where the two models disagree but the mean decides (reference
    ensemble_predictions merge semantics)."""
    from multitalent_tpu.inference.predict import ensemble_predictions

    f1 = tmp_path / "m1"
    f2 = tmp_path / "m2"
    f1.mkdir()
    f2.mkdir()
    shape = (4, 5, 6)
    # model 1: very confident class 1; model 2: mildly prefers class 2.
    # mean: class 1 wins everywhere model 1 was confident.
    p1 = np.zeros((3, *shape), np.float32)
    p1[1] = 0.9
    p1[0] = p1[2] = 0.05
    p2 = np.zeros((3, *shape), np.float32)
    p2[2] = 0.5
    p2[0] = 0.3
    p2[1] = 0.2
    props = full_properties(shape)
    for f, p in ((f1, p1), (f2, p2)):
        np.savez_compressed(f / "caseA.npz", softmax=p.astype(np.float16))
        save_pickle(props, str(f / "caseA.pkl"))
    out = tmp_path / "ens"
    ensemble_predictions([str(f1), str(f2)], str(out), num_threads=1)
    seg, _ = read_nifti(str(out / "caseA.nii.gz"))
    # mean class1 = 0.55, class2 = 0.275 -> all voxels class 1
    assert (seg == 1).all()
