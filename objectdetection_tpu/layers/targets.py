"""Training-target assignment, fully on-device with static shapes.

Two generators:

- :func:`rpn_targets` ≙ the reference's host-numpy
  ``PreprareTrainData.build_rpn_targets`` (``data_processor.py:173-294``) —
  the O(A·G) anchor-matching loop that dominated reference training time runs
  here as one broadcasted IoU + rank-based subsampling program on the TPU.
- :func:`detection_targets` ≙ the per-image TF graph ``BuildDetectionTargets``
  (``data_processor.py:430-658``), replacing `boolean_mask`/`random_shuffle`
  dynamic shapes with validity masks and PRNG rank sampling.

Random subsampling uses explicit `jax.random` keys (the reference leaks
global numpy seed state, `shapes.py:127`).

Matching rules preserved exactly (order matters, data_processor.py:233-244):
negatives are `max IoU < 0.3`, then the best anchor per GT is forced
positive, then `max IoU ≥ 0.7` is positive; positives are capped at half the
budget, negatives fill the rest.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from objectdetection_tpu.geometry import encode_box_deltas, iou_matrix
from objectdetection_tpu.ops.roi_align import crop_and_resize


def _rank_among(mask: Array, key: Array) -> Array:
    """Random rank of each True element among True elements (False → big).

    Returns int32 [N]: a permutation rank such that the True entries receive
    0..k-1 in uniform-random order.
    """
    n = mask.shape[0]
    noise = jax.random.uniform(key, (n,))
    sort_key = jnp.where(mask, noise, 2.0)  # invalid sink to the end
    order = jnp.argsort(sort_key)
    ranks = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return jnp.where(mask, ranks, n)


class RPNTargets(NamedTuple):
    target_class: Array  # [A] int32 in {-1, 0, +1}
    target_deltas: Array  # [rpn_train_anchors, 4] packed positives, zero-pad
    num_positives: Array  # [] int32


def rpn_targets(
    anchors: Array,
    gt_boxes: Array,
    gt_valid: Array,
    config,
    rng: Array,
    encode_fn=None,
) -> RPNTargets:
    """Per-image RPN classification/regression targets.

    Args:
      anchors: [A, 4] (same coordinate frame as gt_boxes).
      gt_boxes: [G, 4] zero-padded GT boxes.
      gt_valid: [G] bool.
      config: any config with rpn_train_anchors_per_image / rpn_bbox_stddev.
      rng: PRNG key for the balancing subsample.
      encode_fn: optional (boxes, gt) → deltas override (e.g. the Faster
        R-CNN family's legacy +1 encoding); default is the Mask R-CNN
        center-form encoding.
    """
    a = anchors.shape[0]
    budget = config.rpn_train_anchors_per_image
    half = budget // 2
    if encode_fn is None:
        encode_fn = encode_box_deltas

    from objectdetection_tpu.ops.anchor_match import anchor_match

    match = anchor_match(anchors, gt_boxes, gt_valid)
    anchor_max = match.anchor_max
    anchor_argmax = match.anchor_argmax

    target = jnp.zeros((a,), jnp.int32)
    target = jnp.where(anchor_max < 0.3, -1, target)
    # best anchor per valid GT is positive even below 0.7 (COND 2)
    gt_best_anchor = match.gt_argmax  # [G]
    force_pos = (
        jnp.zeros((a,), bool)
        .at[gt_best_anchor]
        .max(gt_valid)
    )
    target = jnp.where(force_pos, 1, target)
    target = jnp.where(anchor_max >= 0.7, 1, target)
    # images with no valid GT get no positives
    any_gt = jnp.any(gt_valid)
    target = jnp.where(any_gt, target, jnp.minimum(target, 0))

    key_pos, key_neg = jax.random.split(rng)

    is_pos = target == 1
    pos_rank = _rank_among(is_pos, key_pos)
    keep_pos = is_pos & (pos_rank < half)
    n_pos = jnp.sum(keep_pos)

    is_neg = target == -1
    neg_rank = _rank_among(is_neg, key_neg)
    keep_neg = is_neg & (neg_rank < budget - n_pos)

    target = jnp.where(is_pos & ~keep_pos, 0, target)
    target = jnp.where(is_neg & ~keep_neg, 0, target)

    # Packed deltas for kept positives in ascending anchor order
    # (data_processor.py:266-292 packs positives by anchor index).
    matched_gt = jnp.take(gt_boxes, anchor_argmax, axis=0)  # [A, 4]
    deltas_all = encode_fn(anchors, matched_gt)
    deltas_all = deltas_all / jnp.asarray(config.rpn_bbox_stddev, jnp.float32)

    keep_pos_final = target == 1
    order = jnp.argsort(jnp.where(keep_pos_final, 0, 1), stable=True)
    packed = jnp.take(deltas_all, order[:budget], axis=0)
    slot_valid = jnp.take(keep_pos_final, order[:budget])
    packed = jnp.where(slot_valid[:, None], packed, 0.0)

    return RPNTargets(
        target_class=target,
        target_deltas=packed,
        num_positives=jnp.sum(keep_pos_final),
    )


class DetectionTargets(NamedTuple):
    rois: Array  # [T, 4] sampled proposals (pos first), zero-pad
    target_class_ids: Array  # [T] int32, 0 for negatives/padding
    target_deltas: Array  # [T, 4] zero except positive rows
    target_masks: Array  # [T, mh, mw] float {0,1}; zeros when masks absent
    pos_mask: Array  # [T] bool — rows that are sampled positives
    valid_mask: Array  # [T] bool — rows that are sampled (pos or neg)


def detection_targets(
    proposals: Array,
    gt_boxes: Array,
    gt_class_ids: Array,
    config,
    rng: Array,
    gt_masks: Optional[Array] = None,
    encode_fn=None,
    masks_are_mini: bool = False,
) -> DetectionTargets:
    """Per-image second-stage training targets. ≙ data_processor.py:512-627.

    Args:
      proposals: [P, 4] normalized, zero-padded.
      gt_boxes: [G, 4] normalized, zero-padded.
      gt_class_ids: [G] int32, 0 = padding.
      config: detector config.
      rng: PRNG key.
      gt_masks: optional [G, H, W] instance masks for mask-head targets —
        either full molded-image frame, or (with `masks_are_mini`) mini-masks
        cropped to each instance's gt box (config.mini_mask_shape, ≙ the
        reference's USE_MINI_MASK memory optimization, config.py:55-58).
      masks_are_mini: interpret gt_masks in per-instance box frames.
    """
    t = config.train_rois_per_image
    num_pos_budget = int(t * config.roi_positive_ratio)

    prop_valid = jnp.sum(jnp.abs(proposals), axis=1) > 0
    gt_valid = gt_class_ids > 0

    iou = iou_matrix(proposals, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    roi_iou_max = jnp.max(iou, axis=1)

    is_pos = prop_valid & (roi_iou_max >= 0.5)
    is_neg = prop_valid & (roi_iou_max < 0.5)

    key_pos, key_neg = jax.random.split(rng)
    pos_rank = _rank_among(is_pos, key_pos)
    keep_pos = is_pos & (pos_rank < num_pos_budget)
    n_pos = jnp.sum(keep_pos)

    # data_processor.py:593-594: negatives scale with the positive count
    neg_budget = (
        (1.0 / config.roi_positive_ratio) * n_pos.astype(jnp.float32)
    ).astype(jnp.int32) - n_pos
    neg_rank = _rank_among(is_neg, key_neg)
    keep_neg = is_neg & (neg_rank < neg_budget)

    # pack: positives first (by random rank), then negatives, then padding
    p = proposals.shape[0]
    sort_key = jnp.where(
        keep_pos, pos_rank, jnp.where(keep_neg, p + neg_rank, 3 * p)
    )
    order = jnp.argsort(sort_key)[:t]
    if order.shape[0] < t:  # fewer proposals than the ROI budget: pad
        order = jnp.pad(order, (0, t - order.shape[0]))
        pad_row = jnp.arange(t) >= p
    else:
        pad_row = jnp.zeros((t,), bool)
    rois = jnp.take(proposals, order, axis=0)
    row_pos = jnp.take(keep_pos, order) & ~pad_row
    row_valid = (jnp.take(keep_pos | keep_neg, order)) & ~pad_row
    rois = jnp.where(row_valid[:, None], rois, 0.0)

    gt_assign = jnp.argmax(jnp.take(iou, order, axis=0), axis=1)  # [T]
    tgt_class = jnp.take(gt_class_ids, gt_assign)
    tgt_class = jnp.where(row_pos, tgt_class, 0)

    matched_gt = jnp.take(gt_boxes, gt_assign, axis=0)
    deltas = (encode_fn or encode_box_deltas)(rois, matched_gt) / jnp.asarray(
        config.bbox_stddev, jnp.float32
    )
    deltas = jnp.where(row_pos[:, None], deltas, 0.0)
    # avoid NaNs leaking from log(0/0) on padded rows
    deltas = jnp.nan_to_num(deltas)

    mh, mw = config.mask_shape
    if gt_masks is not None:
        # Crop each positive ROI's matched GT mask to the ROI box, resized to
        # the mask-head output resolution (Mask R-CNN mask targets).
        matched_masks = jnp.take(gt_masks, gt_assign, axis=0)  # [T, H, W]
        if masks_are_mini:
            # mini-masks live in their gt box's frame: express the ROI in
            # box-relative coordinates before cropping
            gh = jnp.maximum(matched_gt[:, 2] - matched_gt[:, 0], 1e-6)
            gw = jnp.maximum(matched_gt[:, 3] - matched_gt[:, 1], 1e-6)
            crop_boxes = jnp.stack(
                [
                    (rois[:, 0] - matched_gt[:, 0]) / gh,
                    (rois[:, 1] - matched_gt[:, 1]) / gw,
                    (rois[:, 2] - matched_gt[:, 0]) / gh,
                    (rois[:, 3] - matched_gt[:, 1]) / gw,
                ],
                axis=1,
            )
        else:
            crop_boxes = rois

        def crop_one(mask, box):
            return crop_and_resize(mask[:, :, None], box[None], (mh, mw))[0, :, :, 0]

        target_masks = jax.vmap(crop_one)(matched_masks, crop_boxes)
        target_masks = jnp.where(
            row_pos[:, None, None], jnp.round(target_masks), 0.0
        )
    else:
        target_masks = jnp.zeros((t, mh, mw), jnp.float32)

    return DetectionTargets(
        rois=rois,
        target_class_ids=tgt_class,
        target_deltas=deltas,
        target_masks=target_masks,
        pos_mask=row_pos,
        valid_mask=row_valid,
    )
