"""Global configuration constants (reference: nnunet/configuration.py:3-4)."""
import os

default_num_threads = int(os.environ.get("MTTPU_def_n_proc", os.environ.get("nnUNet_def_n_proc", 8)))

# If the spacing ratio between the out-of-plane axis and the in-plane axes exceeds this,
# resampling is done separately along that axis (nearest/linear) to avoid interpolation
# artifacts in highly anisotropic CT (reference: configuration.py:4).
RESAMPLING_SEPARATE_Z_ANISO_THRESHOLD = 3
