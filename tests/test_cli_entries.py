"""CLI parity entries: export-to-zip round trip, task overlay PNGs, and the
pretrained-info printer (reference setup.py:39,43,47)."""
from __future__ import annotations

import os
import zipfile

import numpy as np
import pytest


def _make_model_dir(base, task="Task004_Hippocampus", config="3d_fullres",
                    trainer_dir="TrainerV2__MTTPUPlansv2.1", folds=(0,)):
    mdir = os.path.join(base, config, task, trainer_dir)
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, "plans.pkl"), "wb") as f:
        f.write(b"plans")
    with open(os.path.join(mdir, "postprocessing.json"), "w") as f:
        f.write("{}")
    for fd in folds:
        fdir = os.path.join(mdir, f"fold_{fd}")
        os.makedirs(fdir, exist_ok=True)
        for name in ("model_final_checkpoint.ckpt",
                     "model_final_checkpoint.ckpt.pkl", "debug.json"):
            with open(os.path.join(fdir, name), "wb") as f:
                f.write(b"x")
    return mdir


def test_export_model_to_zip_roundtrip(tmp_path, monkeypatch):
    """Export zips paths relative to network_training_output_dir so
    install_model_from_zip_file reproduces the layout on another machine
    (collect_pretrained_models.py:143-214 inverse pairing)."""
    from multitalent_tpu.cli.export_model import main as export_main
    from multitalent_tpu.inference.pretrained_models import (
        install_model_from_zip_file)

    src = tmp_path / "src_results"
    monkeypatch.setenv("RESULTS_FOLDER", str(src))
    from multitalent_tpu import paths
    base = paths.network_training_output_dir()
    _make_model_dir(base)
    # ensemble postprocessing travels too (valid name pattern only)
    edir = os.path.join(base, "ensembles", "Task004_Hippocampus",
                        "ensemble_3d_fullres__TrainerV2__MTTPUPlansv2.1--"
                        "3d_fullres__TrainerV2__MTTPUPlansv2.1")
    os.makedirs(edir)
    with open(os.path.join(edir, "postprocessing.json"), "w") as f:
        f.write("{}")
    out_zip = str(tmp_path / "export.zip")
    export_main(["-t", "4", "-o", out_zip, "-m", "3d_fullres", "-f", "0"])
    names = set(zipfile.ZipFile(out_zip).namelist())
    assert ("3d_fullres/Task004_Hippocampus/TrainerV2__MTTPUPlansv2.1/"
            "fold_0/model_final_checkpoint.ckpt") in names
    assert ("3d_fullres/Task004_Hippocampus/TrainerV2__MTTPUPlansv2.1/"
            "plans.pkl") in names
    assert any(n.startswith("ensembles/") for n in names)

    dst = tmp_path / "dst_results"
    monkeypatch.setenv("RESULTS_FOLDER", str(dst))
    install_model_from_zip_file(out_zip)
    got = os.path.join(paths.network_training_output_dir(), "3d_fullres",
                       "Task004_Hippocampus", "TrainerV2__MTTPUPlansv2.1")
    assert os.path.isfile(os.path.join(got, "plans.pkl"))
    assert os.path.isfile(os.path.join(got, "fold_0",
                                       "model_final_checkpoint.ckpt"))


def test_export_model_strict_failures(tmp_path, monkeypatch):
    from multitalent_tpu.inference.pretrained_models import (
        export_pretrained_model)
    monkeypatch.setenv("RESULTS_FOLDER", str(tmp_path / "r"))
    from multitalent_tpu import paths
    base = paths.network_training_output_dir()
    mdir = _make_model_dir(base)
    os.remove(os.path.join(mdir, "postprocessing.json"))
    with pytest.raises(RuntimeError, match="missing the model 2d"):
        export_pretrained_model("Task004_Hippocampus",
                                str(tmp_path / "a.zip"), folds=(0,))
    with pytest.raises(RuntimeError, match="postprocessing.json missing"):
        export_pretrained_model("Task004_Hippocampus",
                                str(tmp_path / "a.zip"),
                                models=("3d_fullres",), folds=(0,))
    # non-strict: skips both complaints
    export_pretrained_model("Task004_Hippocampus", str(tmp_path / "b.zip"),
                            folds=(0,), strict=False)
    assert zipfile.ZipFile(str(tmp_path / "b.zip")).namelist()


def test_plot_task_pngs_raw(tmp_path, monkeypatch):
    from multitalent_tpu.cli.plot_task_pngs import main as plot_main
    from multitalent_tpu.io.nifti import Geometry, write_nifti

    raw = tmp_path / "raw" / "nnUNet_raw_data" / "Task004_Hippocampus"
    (raw / "imagesTr").mkdir(parents=True)
    (raw / "labelsTr").mkdir(parents=True)
    rng = np.random.RandomState(0)
    g = Geometry()
    for case in ("hippocampus_001", "hippocampus_002"):
        img = rng.standard_normal((8, 9, 10)).astype(np.float32)
        seg = np.zeros((8, 9, 10), np.uint8)
        seg[3:5, 2:6, 2:6] = 1
        write_nifti(raw / "imagesTr" / f"{case}_0000.nii.gz", img, g)
        write_nifti(raw / "labelsTr" / f"{case}.nii.gz", seg, g)
    monkeypatch.setenv("nnUNet_raw_data_base", str(tmp_path / "raw"))
    out = tmp_path / "pngs"
    plot_main(["-t", "Task004_Hippocampus", "-o", str(out), "--use_raw",
               "-num_processes", "1"])
    pngs = sorted(os.listdir(out))
    assert pngs == ["hippocampus_001.png", "hippocampus_002.png"]
    with open(out / pngs[0], "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_plot_task_pngs_preprocessed(tmp_path, monkeypatch):
    from multitalent_tpu.cli.plot_task_pngs import main as plot_main

    stage = (tmp_path / "prep" / "Task004_Hippocampus"
             / "MTTPUData_plans_v2.1_stage0")
    stage.mkdir(parents=True)
    rng = np.random.RandomState(1)
    data = np.stack([rng.standard_normal((6, 7, 8)).astype(np.float32),
                     np.where(rng.rand(6, 7, 8) > 0.7, 1.0, -1.0)])
    np.savez(stage / "case0.npz", data=data)
    monkeypatch.setenv("nnUNet_preprocessed", str(tmp_path / "prep"))
    out = tmp_path / "pngs"
    plot_main(["-t", "Task004_Hippocampus", "-o", str(out),
               "-num_processes", "1"])
    assert os.listdir(out) == ["case0.png"]


def test_print_pretrained_model_info(capsys):
    from multitalent_tpu.cli.print_pretrained_info import main as info_main
    info_main(["Task002_Heart"])
    assert "Left Atrium" in capsys.readouterr().out
    with pytest.raises(RuntimeError, match="does not exist"):
        info_main(["Task999_Nope"])
