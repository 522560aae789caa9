"""Segmentation losses, channels-last, pure JAX.

Parity targets: nnunet/training/loss_functions/dice_loss.py:100-195 (soft confusion +
SoftDiceLoss), crossentropy.py:4 (RobustCrossEntropyLoss), dice_loss.py:488
(DC_and_CE_loss), deep_supervision.py:19-43 (MultipleOutputLoss2), and the MultiTalent
masked multi-head loss inlined in MultiTalent_Trainer_DDP.py:544-623.

Conventions:
- logits: (B, *spatial, C); label maps: (B, *spatial) integer (or (B, *spatial, 1))
- everything is a pure function returning scalars/pytrees; cross-device batch dice
  falls out of computing over the *global* batch under jit+sharding (XLA inserts the
  psum that replaces the reference's awesome_allgather_function)
- the MultiTalent per-sample/per-region Python loops are replaced by a dense
  label->region one-hot matmul mask (same math, no loops; MXU-friendly)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def softmax_helper(logits):
    return jax.nn.softmax(logits, axis=-1)


def one_hot_last(labels, num_classes):
    return jax.nn.one_hot(labels.astype(jnp.int32), num_classes, dtype=jnp.float32)


def _spatial_axes(x):
    return tuple(range(1, x.ndim - 1))


def get_tp_fp_fn_tn(probs, labels, mask=None, batch_dice=False, square=False):
    """Soft confusion-matrix entries per class. probs (B,*S,C); labels (B,*S) ints or
    (B,*S,C) one-hot; mask (B,*S) with 1=valid. Returns (tp, fp, fn, tn) of shape (C,)
    when batch_dice else (B, C)."""
    if labels.ndim == probs.ndim:
        y = labels.astype(jnp.float32)
    else:
        y = one_hot_last(labels, probs.shape[-1])
    tp = probs * y
    fp = probs * (1 - y)
    fn = (1 - probs) * y
    tn = (1 - probs) * (1 - y)
    if mask is not None:
        m = mask[..., None].astype(probs.dtype)
        tp, fp, fn, tn = tp * m, fp * m, fn * m, tn * m
    if square:
        tp, fp, fn, tn = tp**2, fp**2, fn**2, tn**2
    axes = _spatial_axes(probs)
    if batch_dice:
        axes = (0,) + axes
    return tuple(jnp.sum(t, axis=axes) for t in (tp, fp, fn, tn))


def soft_dice_loss(logits, labels, *, batch_dice=False, do_bg=True, smooth=1e-5,
                   apply_nonlin=softmax_helper, mask=None):
    """Negative mean soft Dice (SoftDiceLoss parity: batch dice pools statistics over
    the batch axis — and over devices when the batch is sharded — before dividing)."""
    probs = apply_nonlin(logits) if apply_nonlin is not None else logits
    tp, fp, fn, _ = get_tp_fp_fn_tn(probs, labels, mask=mask, batch_dice=batch_dice)
    nominator = 2 * tp + smooth
    denominator = 2 * tp + fp + fn + smooth
    dc = nominator / (denominator + 1e-8)
    if not do_bg:
        dc = dc[1:] if batch_dice else dc[:, 1:]
    return -jnp.mean(dc)


def _select_class_logp(logp, labels_int):
    """logp[..., labels] without a gather: TPU lowers take_along_axis over the
    class axis to a scalar-gather slow path (measured 68 ms of a 250 ms Liver
    dummyLoad train step at (2,128^3,3) on v5e); the one-hot multiply-reduce is
    an ordinary fused elementwise+reduce at ~memory bandwidth, and its backward
    is a broadcast instead of a scatter. Classes are few (<=47 here), so the
    C-fold read amplification is far cheaper than the gather."""
    c = logp.shape[-1]
    onehot = labels_int[..., None] == jnp.arange(c, dtype=jnp.int32)
    return jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)


def robust_cross_entropy(logits, labels, mask=None):
    """Mean softmax cross-entropy over voxels with integer labels. With a mask, only
    valid voxels contribute (used to ignore the -1 background marker)."""
    labels = labels.astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = _select_class_logp(logp, jnp.clip(labels, 0))
    if mask is not None:
        m = mask.astype(jnp.float32)
        return -jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0)
    return -jnp.mean(ll)


def dc_and_ce_loss(logits, labels, *, batch_dice=False, weight_ce=1.0, weight_dice=1.0,
                   smooth=1e-5):
    """DC_and_CE_loss parity (aggregate='sum'): weight_ce*CE + weight_dice*(-dice)."""
    ce = robust_cross_entropy(logits, labels)
    dc = soft_dice_loss(logits, labels, batch_dice=batch_dice, do_bg=False, smooth=smooth)
    return weight_ce * ce + weight_dice * dc


def ds_loss_weights(num_outputs: int, mask_lowest: bool = True) -> np.ndarray:
    """Deep-supervision weights 1/2^i, optionally zeroing the lowest-resolution output,
    normalized to sum 1 (nnUNetTrainerV2.py:76-90)."""
    w = np.array([1 / (2**i) for i in range(num_outputs)])
    if mask_lowest and num_outputs > 1:
        w[-1] = 0
    return w / w.sum()


def deep_supervision_loss(outputs, targets, loss_fn, weights) -> jnp.ndarray:
    """MultipleOutputLoss2 parity: weighted sum of `loss_fn` over DS levels."""
    total = 0.0
    for w, o, t in zip(weights, outputs, targets):
        if w == 0:
            continue
        total = total + w * loss_fn(o, t)
    return total


# ---------------------------------------------------------------------------------
# MultiTalent masked multi-head BCE + batch-dice loss
# ---------------------------------------------------------------------------------

def build_label_region_matrix(regions: dict, region_output_idx: dict, num_labels: int) -> np.ndarray:
    """(num_labels+1, num_regions) binary matrix M with M[l, c]=1 iff global label l is
    part of the region mapped to output channel c. region GT one-hots then become a
    single gather: gt_regions = M[labels]."""
    num_regions = len(region_output_idx)
    m = np.zeros((num_labels + 1, num_regions), dtype=np.float32)
    for r, labels in regions.items():
        c = region_output_idx[r]
        for l in labels:
            m[int(l), c] = 1.0
    return m


def multitalent_loss(logits, labels, valid_region_mask, label_region_matrix,
                     *, batch_dice=True, axis_name: str | None = None):
    """Masked sigmoid BCE + batch-dice over region channels
    (compute_loss parity, MultiTalent_Trainer_DDP.py:544-623, vectorized).

    logits: (B, *S, R) region-channel logits
    labels: (B, *S) global label map (ints 0..L)
    valid_region_mask: (B, R) 1 where that region is annotated for that sample
    label_region_matrix: (L+1, R) from build_label_region_matrix

    Returns (loss, ce, dice_sum) where loss = ce - dice_sum:
    - ce: sum over (sample, valid region) of the spatial-mean BCE-with-logits
    - dice_sum: per-channel batch dice (stats summed over global batch; `axis_name`
      psums across devices when run under shard_map — under plain jit with a sharded
      batch XLA inserts the collective automatically) summed over channels; channels
      with no valid annotation anywhere get 0 (0/eps), like the reference.
    """
    logits = logits.astype(jnp.float32)
    b = logits.shape[0]
    num_regions = logits.shape[-1]
    gt = jnp.take(label_region_matrix, jnp.clip(labels.astype(jnp.int32), 0), axis=0)
    # gt: (B, *S, R) in {0,1}
    vmask = valid_region_mask.astype(jnp.float32)  # (B, R)
    vb = vmask.reshape((b,) + (1,) * (logits.ndim - 2) + (num_regions,))

    # --- BCE: per (b, r) spatial mean, only valid regions, summed -----------------
    # log-sigmoid-based BCE-with-logits, numerically stable
    bce_map = jnp.maximum(logits, 0) - logits * gt + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    spatial_axes = _spatial_axes(logits)
    bce_bc = jnp.mean(bce_map, axis=spatial_axes)  # (B, R)
    ce = jnp.sum(bce_bc * vmask)

    # --- batch dice over region channels ------------------------------------------
    probs = jax.nn.sigmoid(logits)
    tp = jnp.sum(probs * gt * vb, axis=spatial_axes)        # (B, R)
    fp = jnp.sum(probs * (1 - gt) * vb, axis=spatial_axes)
    fn = jnp.sum((1 - probs) * gt * vb, axis=spatial_axes)
    if batch_dice:
        tp, fp, fn = (jnp.sum(t, axis=0) for t in (tp, fp, fn))  # (R,)
        if axis_name is not None:
            tp = jax.lax.psum(tp, axis_name)
            fp = jax.lax.psum(fp, axis_name)
            fn = jax.lax.psum(fn, axis_name)
    dc = 2 * tp / jnp.maximum(2 * tp + fp + fn, 1e-7)
    dc_sum = jnp.sum(dc)

    return ce - dc_sum, ce, dc_sum


def multitalent_ds_loss(outputs, targets, valid_region_mask, label_region_matrix,
                        weights, *, batch_dice=True, axis_name: str | None = None):
    """Deep-supervised MultiTalent loss; returns (loss, ce, dice) totals
    (run_iteration logs the components separately, MultiTalent_Trainer_DDP.py:324-370)."""
    total = ce_total = dc_total = 0.0
    for w, o, t in zip(weights, outputs, targets):
        if w == 0:
            continue
        l, ce, dc = multitalent_loss(o, t, valid_region_mask, label_region_matrix,
                                     batch_dice=batch_dice, axis_name=axis_name)
        total = total + w * l
        ce_total = ce_total + w * ce
        dc_total = dc_total + w * dc
    return total, ce_total, dc_total


# --- additional loss zoo (reference: loss_functions/) ------------------------------

def gdl_loss(logits, labels, *, apply_nonlin=softmax_helper, smooth=1e-5,
             square_volumes=False):
    """Generalized Dice loss (dice_loss.py:25): class weights 1/volume^2."""
    probs = apply_nonlin(logits)
    y = one_hot_last(labels, probs.shape[-1]) if labels.ndim != probs.ndim else labels
    axes = (0,) + _spatial_axes(probs)
    tp = jnp.sum(probs * y, axis=axes)
    fp = jnp.sum(probs * (1 - y), axis=axes)
    fn = jnp.sum((1 - probs) * y, axis=axes)
    volumes = jnp.sum(y, axis=axes)
    if square_volumes:
        w = 1 / jnp.maximum(volumes**2, 1e-6)
    else:
        w = 1 / jnp.maximum(volumes, 1e-6)
    nom = jnp.sum(w * 2 * tp) + smooth
    den = jnp.sum(w * (2 * tp + fp + fn)) + smooth
    return -(nom / den)


def topk_cross_entropy(logits, labels, k_percent=10.0):
    """TopK loss (TopK_loss.py:21): mean CE over the hardest k% voxels."""
    labels = labels.astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -_select_class_logp(logp, jnp.clip(labels, 0))
    flat = ce.reshape(-1)
    k = max(1, int(flat.shape[0] * k_percent / 100))
    top, _ = jax.lax.top_k(flat, k)
    return jnp.mean(top)


def focal_ce_loss(logits, labels, gamma=2.0, alpha=0.25):
    """Multiclass focal loss (focal_loss.py:23)."""
    labels = labels.astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = _select_class_logp(logp, jnp.clip(labels, 0))
    pt = jnp.exp(ll)
    return jnp.mean(-alpha * (1 - pt) ** gamma * ll)


def dc_and_bce_loss(logits, target_onehot, *, batch_dice=True, smooth=1e-5):
    """DC_and_BCE_loss parity (dice_loss.py:548): sigmoid BCE + soft dice on
    one-hot/region targets."""
    logits = logits.astype(jnp.float32)
    bce = jnp.mean(jnp.maximum(logits, 0) - logits * target_onehot
                   + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    dc = soft_dice_loss(logits, target_onehot, batch_dice=batch_dice, do_bg=True,
                        smooth=smooth, apply_nonlin=jax.nn.sigmoid)
    return bce + dc


def mcc_loss(logits, labels, *, apply_nonlin=softmax_helper, smooth: float = 0.0,
             do_bg: bool = True):
    """Matthews correlation coefficient loss (dice_loss.py:198): -MCC computed from
    voxel-normalized soft confusion entries, averaged over classes (background
    channel dropped when do_bg=False, MCC_loss's batch_mcc/do_bg knob)."""
    probs = apply_nonlin(logits) if apply_nonlin is not None else logits
    voxels = np.prod(probs.shape[1:-1]) * probs.shape[0]
    tp, fp, fn, tn = get_tp_fp_fn_tn(probs, labels, batch_dice=True)
    tp, fp, fn, tn = tp / voxels, fp / voxels, fn / voxels, tn / voxels
    nominator = tp * tn - fp * fn + smooth
    denominator = jnp.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)) + smooth
    mcc = nominator / (denominator + 1e-8)
    if not do_bg:
        mcc = mcc[1:]
    return -jnp.mean(mcc)


def squared_dice_loss(logits, labels, *, batch_dice=False, do_bg=True, smooth=1.0,
                      apply_nonlin=softmax_helper):
    """SoftDiceLossSquared (dice_loss.py:245): denominator uses probs^2 + gt^2."""
    probs = apply_nonlin(logits) if apply_nonlin is not None else logits
    if labels.ndim == probs.ndim:
        y = labels.astype(jnp.float32)
    else:
        y = one_hot_last(labels, probs.shape[-1])
    axes = _spatial_axes(probs)
    if batch_dice:
        axes = (0,) + axes
    intersect = jnp.sum(probs * y, axis=axes) + smooth
    denom = jnp.sum(probs ** 2, axis=axes) + jnp.sum(y ** 2, axis=axes) + smooth
    dc = 2 * intersect / denom
    if not do_bg:
        dc = dc[1:] if batch_dice else dc[:, 1:]
    return -jnp.mean(dc)


def dynamic_task_prioritization_loss(logits, labels, running_dice, *,
                                     gamma: float = 2.0, smooth: float = 1.0,
                                     momentum: float = 0.97, update_kpi: bool = True,
                                     weight_ce: float = 1.0, weight_dice: float = 1.0):
    """Dynamic task prioritization DC+CE (dice_loss.py:303 Dynamic...SoftDiceLoss and
    :347 DynamicTaskPrioritizationLoss), functional: per-class dice terms are weighted
    by (1 - running_dice)^gamma so poorly-performing classes dominate the gradient.

    The reference keeps `running_organwise_dice` as mutable module state updated with
    EMA momentum 0.97 under no_grad; here the running KPI is threaded explicitly —
    returns (loss, new_running_dice) so the train step stays a pure function.
    `running_dice` has shape (num_classes - 1,) (foreground classes).
    """
    probs = softmax_helper(logits)
    num_fg = probs.shape[-1] - 1
    tp, fp, fn, _ = get_tp_fp_fn_tn(probs, labels, batch_dice=False)
    tp, fp, fn = tp[:, 1:], fp[:, 1:], fn[:, 1:]
    present = (tp + fp + fn) > 50  # the reference's per-sample class-present mask

    dc = (2 * tp + smooth) / (2 * tp + fp + fn + smooth + 1e-8)

    # KPI update (stop-gradient, like the reference's no_grad block)
    mean_dc = jnp.sum(jax.lax.stop_gradient(dc) * present, axis=0) / (
        jnp.sum(present, axis=0) + 1e-6)
    any_in_batch = jnp.any(present, axis=0)
    new_running = jnp.where(
        any_in_batch & jnp.asarray(update_kpi),
        running_dice * momentum + (1 - momentum) * mean_dc,
        running_dice)

    weights = (1 - jax.lax.stop_gradient(new_running)) ** gamma
    weights = weights * (num_fg / (jnp.sum(weights) + 1e-8))
    dice_term = -jnp.mean(weights * dc)
    ce = robust_cross_entropy(logits, labels)
    return weight_ce * ce + weight_dice * dice_term, new_running
