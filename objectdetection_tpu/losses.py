"""Detection losses.

≙ the reference `Loss` class (`MaskRCNN/building_blocks/loss_optimize.py`)
with its Python-per-batch loops replaced by masked reductions, plus the two
pieces the reference never had: a mask loss and a total loss (SURVEY.md §0 —
the reference defines losses only and has no optimizer anywhere).

Deliberate bug handling (SURVEY.md §7 "reference bugs"): the reference's
`mrcnn_box_loss` computes *binary cross-entropy* on box deltas
(loss_optimize.py:195-197) — a bug. The default here is the correct
smooth-L1; `config.compat_reference_box_loss` reproduces the reference for
parity testing.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import Array


def smooth_l1(x: Array) -> Array:
    """Elementwise smooth-L1 (Huber, delta=1). ≙ loss_optimize.py:75-77."""
    absx = jnp.abs(x)
    return jnp.where(absx < 1.0, 0.5 * absx * absx, absx - 0.5)


def _masked_mean(values: Array, mask: Array) -> Array:
    mask = jnp.broadcast_to(mask, values.shape)
    denom = jnp.sum(mask)
    return jnp.where(denom > 0, jnp.sum(values * mask) / jnp.maximum(denom, 1), 0.0)


def rpn_class_loss(target_class: Array, logits: Array) -> Array:
    """Binary fg/bg cross-entropy over non-neutral anchors.

    ≙ loss_optimize.py:12-43. target_class: [B, A] in {-1, 0, 1};
    logits: [B, A, 2].
    """
    non_neutral = target_class != 0
    labels = (target_class == 1).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return _masked_mean(ce, non_neutral.astype(ce.dtype))


def rpn_box_loss(
    target_deltas: Array, pred_deltas: Array, target_class: Array
) -> Array:
    """Smooth-L1 on positive anchors.

    ≙ loss_optimize.py:47-82: predictions are gathered at positive-anchor
    positions (ascending anchor order) and compared against the packed
    target rows.

    target_deltas: [B, K, 4] packed positives (K = rpn_train budget);
    pred_deltas: [B, A, 4]; target_class: [B, A].
    """
    b, k = target_deltas.shape[0], target_deltas.shape[1]

    def per_image(tgt, pred, cls):
        is_pos = cls == 1
        order = jnp.argsort(jnp.where(is_pos, 0, 1), stable=True)[:k]
        pred_pos = jnp.take(pred, order, axis=0)  # [K, 4]
        slot_valid = jnp.take(is_pos, order)  # [K]
        err = smooth_l1(tgt - pred_pos)
        return jnp.sum(err * slot_valid[:, None]), jnp.sum(slot_valid) * 4

    sums, counts = jax.vmap(per_image)(target_deltas, pred_deltas, target_class)
    total = jnp.sum(counts)
    return jnp.where(total > 0, jnp.sum(sums) / jnp.maximum(total, 1), 0.0)


def mrcnn_class_loss(
    target_class_ids: Array,
    pred_logits: Array,
    active_class_ids: Array,
) -> Array:
    """Sparse softmax CE over sampled ROIs, masked by dataset-active classes.

    ≙ loss_optimize.py:85-148: the loss row is weighted by whether the
    *predicted* class is active in the image's dataset, normalized by the
    active-prediction count.
    """
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, target_class_ids[..., None], axis=-1)[..., 0]
    pred_class = jnp.argmax(pred_logits, axis=-1)
    pred_active = jnp.take_along_axis(
        active_class_ids, pred_class, axis=-1
    ).astype(ce.dtype)
    denom = jnp.sum(pred_active)
    return jnp.where(denom > 0, jnp.sum(ce * pred_active) / jnp.maximum(denom, 1), 0.0)


def mrcnn_box_loss(
    target_deltas: Array,
    pred_deltas: Array,
    target_class_ids: Array,
    compat_reference: bool = False,
) -> Array:
    """Box refinement loss on positive ROIs, per target class.

    ≙ loss_optimize.py:152-201. pred_deltas: [B, T, C, 4]; the prediction for
    each positive ROI's *target class* is selected. Default smooth-L1;
    `compat_reference` reproduces the reference's binary-CE bug.
    """
    pos = target_class_ids > 0  # [B, T]
    cls = jnp.maximum(target_class_ids, 0)
    pred = jnp.take_along_axis(
        pred_deltas, cls[..., None, None].repeat(4, -1), axis=2
    )[:, :, 0, :]  # [B, T, 4]

    if compat_reference:
        # K.binary_crossentropy(target, output) with probabilities
        p = jnp.clip(pred, 1e-7, 1 - 1e-7)
        err = -(target_deltas * jnp.log(p) + (1 - target_deltas) * jnp.log(1 - p))
    else:
        err = smooth_l1(target_deltas - pred)
    return _masked_mean(err, pos[..., None].astype(err.dtype))


def mask_loss(
    target_masks: Array, pred_masks: Array, target_class_ids: Array
) -> Array:
    """Per-class binary CE on positive ROIs.

    target_masks: [B, T, mh, mw] {0,1}; pred_masks: [B, T, mh, mw, C]
    sigmoid probabilities; target_class_ids: [B, T].
    """
    pos = target_class_ids > 0
    cls = jnp.maximum(target_class_ids, 0)
    pred = jnp.take_along_axis(
        pred_masks, cls[:, :, None, None, None], axis=-1
    )[..., 0]
    p = jnp.clip(pred, 1e-7, 1 - 1e-7)
    ce = -(target_masks * jnp.log(p) + (1 - target_masks) * jnp.log(1 - p))
    return _masked_mean(ce, pos[:, :, None, None].astype(ce.dtype))


def total_loss(losses: Dict[str, Array]) -> Array:
    """Sum of the component losses (the reference never built one)."""
    return sum(losses.values())
