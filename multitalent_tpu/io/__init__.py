from multitalent_tpu.io.nifti import Geometry, read_nifti, write_nifti  # noqa: F401
