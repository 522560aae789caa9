"""Dry-run the MultiTalent source-task converters on synthetic mini-NIfTIs:
each must produce a valid nnU-Net raw layout (imagesTr/_0000 naming, labelsTr,
dataset.json manifest) from its challenge download structure."""
import json
import os

import numpy as np
import pytest

from multitalent_tpu.io.nifti import Geometry, read_nifti, write_nifti
from multitalent_tpu.tasks import source_converters as sc

GEOM = Geometry(spacing=(1.0, 1.0, 2.5), origin=(0.0, 0.0, 0.0),
                direction=(1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0))


def _vol(rng, labels=False, shape=(4, 6, 6)):
    if labels:
        return rng.randint(0, 3, shape).astype(np.int16)
    return (rng.randn(*shape) * 100).astype(np.int16)


def _write(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_nifti(path, arr, GEOM)


def _check_layout(out_base, n_train, n_test, n_labels):
    imgs = sorted(os.listdir(os.path.join(out_base, "imagesTr")))
    assert len(imgs) == n_train and all(i.endswith("_0000.nii.gz") for i in imgs)
    assert len(os.listdir(os.path.join(out_base, "labelsTr"))) == n_labels
    ts = os.path.join(out_base, "imagesTs")
    assert len(os.listdir(ts)) == n_test
    with open(os.path.join(out_base, "dataset.json")) as f:
        dj = json.load(f)
    assert dj["numTraining"] == n_train
    assert dj["modality"] == {"0": "CT"}
    for entry in dj["training"]:
        ident = os.path.basename(entry["image"])[:-7]
        assert os.path.isfile(os.path.join(out_base, "imagesTr",
                                           ident + "_0000.nii.gz"))
        assert os.path.isfile(os.path.join(out_base, "labelsTr",
                                           ident + ".nii.gz"))


def test_task017_btcv_abdomen(tmp_path):
    rng = np.random.RandomState(0)
    src = tmp_path / "btcv"
    for i in (1, 2):
        _write(str(src / "Training" / "img" / f"img{i:04d}.nii.gz"), _vol(rng))
        _write(str(src / "Training" / "label" / f"label{i:04d}.nii.gz"),
               _vol(rng, labels=True))
    _write(str(src / "Test" / "img" / "img0061.nii.gz"), _vol(rng))
    out = sc.convert_task017_btcv_abdomen(str(src), str(tmp_path / "raw"))
    _check_layout(out, 2, 1, 2)
    assert os.path.isfile(os.path.join(out, "imagesTr", "ABD_001_0000.nii.gz"))


def test_task018_btcv_cervix(tmp_path):
    rng = np.random.RandomState(1)
    src = tmp_path / "cervix"
    for i in (101, 102):
        _write(str(src / "Training" / "img" / f"{i:04d}-Image.nii.gz"), _vol(rng))
        _write(str(src / "Training" / "label" / f"{i:04d}-Mask.nii.gz"),
               _vol(rng, labels=True))
    _write(str(src / "Testing" / "img" / "0201-Image.nii.gz"), _vol(rng))
    out = sc.convert_task018_btcv_cervix(str(src), str(tmp_path / "raw"))
    _check_layout(out, 2, 1, 2)


def test_task055_segthor(tmp_path):
    rng = np.random.RandomState(2)
    src = tmp_path / "segthor"
    for p in ("Patient_01", "Patient_02"):
        _write(str(src / "train" / p / f"{p}.nii.gz"), _vol(rng))
        _write(str(src / "train" / p / "GT.nii.gz"), _vol(rng, labels=True))
    _write(str(src / "test" / "Patient_41.nii.gz"), _vol(rng))
    out = sc.convert_task055_segthor(str(src), str(tmp_path / "raw"))
    _check_layout(out, 2, 1, 2)


def test_task062_nih_pancreas_excludes_and_reorients(tmp_path):
    rng = np.random.RandomState(3)
    imgs = tmp_path / "niftis"
    labs = tmp_path / "labels"
    # one good case, one excluded case
    for case in ("PANCREAS_0001", "PANCREAS_0007"):
        _write(str(imgs / f"{case}.nii.gz"), _vol(rng))
        _write(str(labs / f"label{case[9:]}.nii.gz"), _vol(rng, labels=True))
    out = sc.convert_task062_nih_pancreas(str(imgs), str(labs),
                                          str(tmp_path / "raw"))
    _check_layout(out, 1, 0, 1)
    assert not os.path.isfile(os.path.join(out, "imagesTr",
                                           "PANCREAS_0007_0000.nii.gz"))
    arr, geom = read_nifti(os.path.join(out, "imagesTr",
                                        "PANCREAS_0001_0000.nii.gz"))
    # RAS canonical: identity-in-LPS direction == diag(-1,-1,1)
    np.testing.assert_allclose(np.asarray(geom.direction).reshape(3, 3),
                               np.diag([-1.0, -1.0, 1.0]))


def test_task046_abdorgsegm2_remaps_and_aligns(tmp_path):
    rng = np.random.RandomState(6)
    pan = tmp_path / "pancreas_niftis"
    labs = tmp_path / "zenodo"
    btcv = tmp_path / "btcv_img"
    # pancreas case with a label (sparse values incl. 11->7, 14->8), plus one
    # unlabeled case that must be dropped
    _write(str(pan / "PANCREAS_0001.nii.gz"), _vol(rng))
    _write(str(pan / "PANCREAS_0099.nii.gz"), _vol(rng))
    seg = np.zeros((4, 6, 6), np.int16)
    seg[0, 0, 0], seg[1, 1, 1], seg[2, 2, 2] = 11, 14, 3
    _write(str(labs / "label_tciapancreasct_multiorgan" / "label_tcia_multiorgan"
               / "label0001.nii.gz"), seg)
    # pancreas image written with a DIFFERENT origin than the label: the
    # converter must align it (reference align_img)
    misaligned = Geometry(spacing=(1.0, 1.0, 2.5), origin=(9.0, 9.0, 9.0),
                          direction=GEOM.direction)
    write_nifti(str(pan / "PANCREAS_0001.nii.gz"),
                _vol(rng), misaligned)
    # one labeled BTCV case, one unlabeled
    _write(str(btcv / "img0001.nii.gz"), _vol(rng))
    _write(str(btcv / "img0061.nii.gz"), _vol(rng))
    _write(str(labs / "label_btcv_multiorgan" / "label0001.nii.gz"),
           _vol(rng, labels=True))
    out = sc.convert_task046_abdorgsegm2(
        str(pan), str(labs), btcv_images_dirs=(str(btcv),),
        raw_data_base=str(tmp_path / "raw"))
    _check_layout(out, 2, 0, 2)
    remapped, _ = read_nifti(os.path.join(out, "labelsTr",
                                          "PANCREAS_0001.nii.gz"))
    assert remapped[0, 0, 0] == 7 and remapped[1, 1, 1] == 8
    assert remapped[2, 2, 2] == 2 and remapped.max() <= 8
    _, igeom = read_nifti(os.path.join(out, "imagesTr",
                                       "PANCREAS_0001_0000.nii.gz"))
    np.testing.assert_allclose(igeom.origin, (0.0, 0.0, 0.0))
    assert not os.path.isfile(os.path.join(out, "imagesTr",
                                           "PANCREAS_0099_0000.nii.gz"))
    assert not os.path.isfile(os.path.join(out, "imagesTr",
                                           "img0061_0000.nii.gz"))


def test_task051_structseg(tmp_path):
    rng = np.random.RandomState(7)
    src = tmp_path / "structseg"
    for c in ("1", "2"):
        _write(str(src / c / "data.nii.gz"), _vol(rng))
        _write(str(src / c / "label.nii.gz"), _vol(rng, labels=True))
    out = sc.convert_task051_structseg_thoracic(str(src),
                                                str(tmp_path / "raw"))
    assert out.endswith("Task051_StructSeg2019_Task3_Thoracic_OAR")
    _check_layout(out, 2, 0, 2)


def test_task064_kits(tmp_path):
    rng = np.random.RandomState(4)
    src = tmp_path / "kits"
    for c in ("case_00000", "case_00001"):
        _write(str(src / c / "imaging.nii.gz"), _vol(rng))
        _write(str(src / c / "segmentation.nii.gz"), _vol(rng, labels=True))
    out = sc.convert_task064_kits(str(src), str(tmp_path / "raw"))
    # only 2 cases -> all train (first 210 rule)
    _check_layout(out, 2, 0, 2)


def test_cli_dispatch(tmp_path, monkeypatch, capsys):
    rng = np.random.RandomState(5)
    src = tmp_path / "kits"
    for c in ("case_00000",):
        _write(str(src / c / "imaging.nii.gz"), _vol(rng))
        _write(str(src / c / "segmentation.nii.gz"), _vol(rng, labels=True))
    import sys
    from multitalent_tpu.cli import convert_multitalent_sources as cli
    monkeypatch.setattr(sys, "argv", [
        "prog", "Task064", str(src), "--raw_data_base", str(tmp_path / "raw")])
    cli.main()
    assert "Task064_KiTS_labelsFixed" in capsys.readouterr().out
