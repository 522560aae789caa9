"""MultiTalent-TPU: a TPU-native (JAX/XLA/Pallas) multi-dataset 3D medical image
segmentation framework with the capabilities of MIC-DKFZ/MultiTalent (nnU-Net V1 based).

The framework keeps the reference's artifact contracts (plans dicts, preprocessed case
layout, `_0000.nii.gz` naming, self-describing checkpoints, CLI entry points) while the
runtime is idiomatic JAX: pure functional train steps compiled with `jit` over a
`jax.sharding.Mesh`, on-device augmentation, and a tiled double-buffered sliding-window
inference engine.
"""

__version__ = "0.1.0"
