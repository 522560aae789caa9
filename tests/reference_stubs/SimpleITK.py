"""Test-only SimpleITK stub: the minimal surface the reference's
segmentation_export.py touches at call time (GetImageFromArray +
Set{Spacing,Origin,Direction} + WriteImage), backed by our own NIfTI codec
so reference-written files can be read back and compared voxel-for-voxel.
Everything else raises so accidental reliance is loud."""
from __future__ import annotations

import numpy as np


class Image:
    def __init__(self, array_zyx: np.ndarray):
        self.array = np.asarray(array_zyx)
        self.spacing = (1.0, 1.0, 1.0)
        self.origin = (0.0, 0.0, 0.0)
        self.direction = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)

    def SetSpacing(self, s):
        self.spacing = tuple(float(v) for v in s)

    def SetOrigin(self, o):
        self.origin = tuple(float(v) for v in o)

    def SetDirection(self, d):
        self.direction = tuple(float(v) for v in d)


def GetImageFromArray(arr) -> Image:
    return Image(arr)


def GetArrayFromImage(img: Image) -> np.ndarray:
    return img.array


def WriteImage(img: Image, fname: str) -> None:
    from multitalent_tpu.io.nifti import Geometry, write_nifti
    write_nifti(fname, img.array,
                Geometry(spacing=img.spacing, origin=img.origin,
                         direction=img.direction))


def ReadImage(fname: str) -> Image:
    from multitalent_tpu.io.nifti import read_nifti
    arr, geom = read_nifti(fname)
    img = Image(arr)
    img.SetSpacing(geom.spacing)
    img.SetOrigin(geom.origin)
    img.SetDirection(geom.direction)
    return img


def __getattr__(name):
    raise NotImplementedError(
        f"SimpleITK stub: {name} is not part of the minimal test surface")
