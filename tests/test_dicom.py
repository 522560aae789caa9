"""Vendored DICOM CT-series reader (io/dicom.py): synthetic series written in
both little-endian transfer syntaxes round-trip into the expected volume and
LPS geometry, and the Task062 converter runs straight from a TCIA-layout
DICOM tree (reference pre-step: Task062_NIHPancreas.py:33-60 via
dicom2nifti)."""
from __future__ import annotations

import os
import struct

import numpy as np

from multitalent_tpu.io.dicom import (convert_tcia_dicom_tree,
                                      parse_dicom_file, read_dicom_series)
from multitalent_tpu.io.nifti import read_nifti

ROWS, COLS = 6, 8


def _el_explicit(group, elem, vr, val: bytes) -> bytes:
    if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
        return (struct.pack("<HH", group, elem) + vr + b"\x00\x00"
                + struct.pack("<I", len(val)) + val)
    return (struct.pack("<HH", group, elem) + vr
            + struct.pack("<H", len(val)) + val)


def _el_implicit(group, elem, val: bytes) -> bytes:
    return struct.pack("<HHI", group, elem, len(val)) + val


def _ds(*vals) -> bytes:
    s = "\\".join(f"{v:g}" for v in vals)
    return (s + " " if len(s) % 2 else s).encode()


def _write_slice(path, z_index, pixels: np.ndarray, explicit: bool,
                 intercept=-1024.0, slope=1.0):
    ts = b"1.2.840.10008.1.2.1\x00" if explicit else b"1.2.840.10008.1.2\x00"
    meta = _el_explicit(0x0002, 0x0010, b"UI", ts)
    el = _el_explicit if explicit else (
        lambda g, e, vr, v: _el_implicit(g, e, v))
    body = b"".join([
        el(0x0020, 0x0013, b"IS", f"{z_index + 1:d} ".encode()),
        el(0x0020, 0x0032, b"DS", _ds(-100.0, -80.0, 50.0 + 2.5 * z_index)),
        el(0x0020, 0x0037, b"DS", _ds(1, 0, 0, 0, 1, 0)),
        el(0x0028, 0x0010, b"US", struct.pack("<H", ROWS)),
        el(0x0028, 0x0011, b"US", struct.pack("<H", COLS)),
        el(0x0028, 0x0030, b"DS", _ds(0.75, 0.5)),  # (row dy, col dx)
        el(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        el(0x0028, 0x0103, b"US", struct.pack("<H", 1)),
        el(0x0028, 0x1052, b"DS", _ds(intercept)),
        el(0x0028, 0x1053, b"DS", _ds(slope)),
        el(0x7FE0, 0x0010, b"OW", pixels.astype("<i2").tobytes()),
    ])
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)


def _make_series(d, explicit: bool, nz=5, seed=0):
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(seed)
    raw = rng.randint(0, 3000, size=(nz, ROWS, COLS)).astype(np.int16)
    order = rng.permutation(nz)  # files on disk in scrambled z order
    for fi, z in enumerate(order):
        _write_slice(os.path.join(d, f"slice{fi:03d}.dcm"), int(z), raw[z],
                     explicit)
    return raw


def test_read_dicom_series_both_syntaxes(tmp_path):
    for explicit in (True, False):
        d = tmp_path / ("exp" if explicit else "imp")
        raw = _make_series(str(d), explicit)
        vol, geom = read_dicom_series(d)
        assert vol.dtype == np.int16
        np.testing.assert_array_equal(vol, raw - 1024)  # rescale applied
        # geometry: LPS, spacing (x=col, y=row, z=slice step)
        np.testing.assert_allclose(geom.spacing, (0.5, 0.75, 2.5))
        np.testing.assert_allclose(geom.origin, (-100.0, -80.0, 50.0))
        np.testing.assert_allclose(geom.direction_matrix(), np.eye(3))


def test_parse_skips_undefined_length_sequence(tmp_path):
    # an undefined-length SQ before PixelData must be skipped, not parsed
    item = struct.pack("<HHI", 0xFFFE, 0xE000, 4) + b"ABCD"
    seq = (struct.pack("<HHI", 0x0008, 0x1140, 0xFFFFFFFF) + item
           + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
    pix = np.arange(ROWS * COLS, dtype=np.int16)
    body = (seq
            + _el_implicit(0x0028, 0x0010, struct.pack("<H", ROWS))
            + _el_implicit(0x0028, 0x0011, struct.pack("<H", COLS))
            + _el_implicit(0x7FE0, 0x0010, pix.tobytes()))
    meta = _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2\x00")
    p = tmp_path / "sq.dcm"
    p.write_bytes(b"\x00" * 128 + b"DICM" + meta + body)
    d = parse_dicom_file(p)
    assert d["Rows"] == ROWS and d["Columns"] == COLS
    assert len(d["PixelData"]) == ROWS * COLS * 2


def test_task062_from_dicom_tree(tmp_path, monkeypatch):
    """Task062 converter runs from the TCIA manifest layout directly."""
    from multitalent_tpu.io.nifti import Geometry, write_nifti
    from multitalent_tpu.tasks.source_converters import (
        convert_task062_nih_pancreas)

    base = tmp_path / "manifest" / "Pancreas-CT"
    labels = tmp_path / "labels"
    labels.mkdir(parents=True)
    raws = {}
    for i in (1, 2):
        case = f"PANCREAS_{i:04d}"
        series = base / case / "study" / "series"
        raws[case] = _make_series(str(series), explicit=(i % 2 == 0), seed=i)
        seg = np.zeros((5, ROWS, COLS), np.uint8)
        seg[1:3, 2:4, 2:5] = 1
        write_nifti(labels / f"label{i:04d}.nii.gz", seg,
                    Geometry(spacing=(0.5, 0.75, 2.5)))
    monkeypatch.setenv("nnUNet_raw_data_base", str(tmp_path / "raw"))
    out = convert_task062_nih_pancreas(str(base), str(labels))
    for i in (1, 2):
        img, geom = read_nifti(
            os.path.join(out, "imagesTr", f"PANCREAS_{i:04d}_0000.nii.gz"))
        # the converter reorients to closest canonical (RAS), which for the
        # LPS-identity DICOM geometry flips the x and y axes (the reference's
        # nibabel as_closest_canonical pass does the same)
        np.testing.assert_array_equal(
            img, (raws[f"PANCREAS_{i:04d}"].astype(np.int16)
                  - 1024)[:, ::-1, ::-1])
        np.testing.assert_allclose(geom.direction_matrix(),
                                   np.diag([-1.0, -1.0, 1.0]))
        assert os.path.isfile(
            os.path.join(out, "labelsTr", f"PANCREAS_{i:04d}.nii.gz"))
    assert os.path.isfile(os.path.join(out, "dataset.json"))
