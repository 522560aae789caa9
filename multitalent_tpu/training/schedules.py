"""Learning-rate schedules.

Parity targets: poly_lr (nnunet/training/learning_rate/poly_lr.py:16-17), the
per-epoch lr assignment in nnUNetTrainerV2.maybe_update_lr (nnUNetTrainerV2.py:393-408)
and the warmup ramps of nnUNetTrainerV2_warmup_increasing_lr / _warmupsegheads
(nnUNet_variants/pretraining/nnUNetTrainerV2_warmup.py:38-117).

TPU-native shape: schedules are pure functions of the *optimizer step*; the reference
updates lr once per epoch, so we map step -> epoch via steps_per_epoch and keep the
same per-epoch staircase (bit-identical lr sequence, jit-friendly).
"""
from __future__ import annotations

import jax.numpy as jnp


def poly_lr(epoch, max_epochs: int, initial_lr: float = 1e-2, exponent: float = 0.9):
    """initial_lr * (1 - epoch/max_epochs)**exponent (poly_lr.py:16-17)."""
    return initial_lr * (1 - epoch / max_epochs) ** exponent


def make_poly_schedule(initial_lr: float, max_epochs: int, steps_per_epoch: int,
                       exponent: float = 0.9):
    """Step-indexed staircase matching maybe_update_lr's epoch-wise poly decay."""

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, max_epochs - 1)
        return poly_lr(epoch.astype(jnp.float32), max_epochs, initial_lr, exponent)

    return schedule


def make_warmup_poly_schedule(initial_lr: float, max_epochs: int, steps_per_epoch: int,
                              warmup_epochs: int = 50, exponent: float = 0.9):
    """Linear per-epoch ramp from initial_lr/warmup to initial_lr over `warmup_epochs`,
    then epoch-wise poly decay (nnUNetTrainerV2_warmup.py:38-64: lr scales with
    (epoch+1)/warmup during warmup; afterwards standard polyLR)."""

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, max_epochs - 1).astype(jnp.float32)
        warm = initial_lr * (epoch + 1) / warmup_epochs
        poly = poly_lr(epoch, max_epochs, initial_lr, exponent)
        return jnp.where(epoch < warmup_epochs, warm, poly)

    return schedule


def make_constant_schedule(lr: float):
    def schedule(step):
        return jnp.full((), lr, dtype=jnp.float32)

    return schedule
