"""Training state pytree + optimizer construction.

Parity targets: nnUNetTrainerV2's SGD(lr 1e-2, nesterov momentum 0.99, weight decay
3e-5) with gradient-norm clip 12 (nnUNetTrainerV2.py:166-170,253-258), nnUNetTrainer's
Adam(3e-4, wd 3e-5) (nnUNetTrainer.py:265-272), and the AdamW head-warmup optimizer of
nnUNetTrainerV2_warmupsegheads (nnUNetTrainerV2_warmup.py:119-130).

TPU-native shape: the state is a single pytree (params fp32, optax momentum fp32,
step counter) that lives sharded/replicated on device; the whole update is inside one
jitted function with donated buffers. bf16 is a compute dtype only — no GradScaler
(bf16 has fp32's exponent range, so the reference's AMP-scaler machinery has no TPU
equivalent and is intentionally absent).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)

    @classmethod
    def create(cls, apply_fn, params, tx) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx, apply_fn=apply_fn)


def make_sgd_optimizer(lr_schedule, momentum: float = 0.99, nesterov: bool = True,
                       weight_decay: float = 3e-5, clip_norm: float = 12.0):
    """The production optimizer (nnUNetTrainerV2.py:166-170 + grad-clip :256).

    Note the reference uses torch's *coupled* weight decay (added to the gradient
    before momentum), i.e. optax.add_decayed_weights placed before the momentum
    transform."""
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=nesterov),
        optax.scale_by_learning_rate(lr_schedule),
    )


def make_adam_optimizer(lr_schedule, weight_decay: float = 3e-5,
                        clip_norm: float | None = 12.0):
    """nnUNetTrainer's Adam(amsgrad=True) (nnUNetTrainer.py:265-272)."""
    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts += [
        optax.scale_by_amsgrad(),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(lr_schedule),
    ]
    return optax.chain(*parts)


def make_adamw_optimizer(lr_schedule, weight_decay: float = 1e-2,
                         clip_norm: float | None = 12.0):
    """AdamW, used for the seg-head warmup phase (nnUNetTrainerV2_warmup.py:119-130)."""
    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts += [
        optax.scale_by_adam(),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(lr_schedule),
    ]
    return optax.chain(*parts)


def make_masked_optimizer(inner: optax.GradientTransformation, mask_fn):
    """Train only the parameters selected by mask_fn(path, leaf)->bool; every other
    gradient is zeroed (the head-warmup trains `seg_outputs` only,
    nnUNetTrainerV2_warmup.py:119-130)."""

    def label_tree(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, v: "train" if mask_fn(jax.tree_util.keystr(path), v)
            else "freeze", params)

    return optax.multi_transform({"train": inner, "freeze": optax.set_to_zero()},
                                 label_tree)


def global_grad_norm(grads) -> jnp.ndarray:
    return optax.global_norm(grads)
