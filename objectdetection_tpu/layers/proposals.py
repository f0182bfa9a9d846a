"""Proposal layer: RPN outputs + anchors → top proposals.

≙ the reference `Proposals` graph (`proposals_tf.py:98-326`):
scale deltas by RPN_BBOX_STDDEV → top-k pre-NMS anchors by foreground score →
decode → clip to [0, 1] → per-image NMS → zero-pad to the post-NMS budget.

The reference loops over images in Python around `tf.image.non_max_suppression`
(proposals_tf.py:188-196); here the whole thing is one vmapped program over
the batch using the tiled TPU NMS.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from objectdetection_tpu.config import DetectorConfig
from objectdetection_tpu.geometry import apply_box_deltas, clip_boxes
from objectdetection_tpu.ops.nms import nms_boxes


def proposal_layer(
    rpn_probs: Array,
    rpn_deltas: Array,
    anchors: Array,
    config: DetectorConfig,
    training: bool = False,
) -> Array:
    """Generate proposals.

    Args:
      rpn_probs: [B, A, 2] softmax (bg, fg) per anchor.
      rpn_deltas: [B, A, 4] raw RPN box deltas.
      anchors: [A, 4] normalized anchors (shared across the batch).
      config: detector config.
      training: pick the train/inference post-NMS budget.

    Returns:
      [B, P, 4] normalized proposals, zero-padded; P = post-NMS budget.
    """
    post_nms = (
        config.post_nms_rois_training if training else config.post_nms_rois_inference
    )
    pre_nms = min(config.pre_nms_rois_count, anchors.shape[0])
    stddev = jnp.asarray(config.rpn_bbox_stddev, jnp.float32)

    scores = rpn_probs[..., 1]  # [B, A] foreground

    # Approximate selection only on the inference path: its accuracy
    # evidence (recall/post-NMS match/trained mAP in
    # benchmarks/approx_topk_recall.py) was measured on the 1024² inference
    # workload; training keeps bit-exact lax.top_k so train-time proposal
    # selection never silently diverges from the evaluated recipe.
    use_approx = getattr(config, "use_approx_topk", False) and not training
    b, a = scores.shape

    if use_approx:
        # measured selection quality at the configured recall target is
        # near-exact — see config.approx_topk_recall_target and
        # benchmarks/approx_topk_recall.py
        rt = float(getattr(config, "approx_topk_recall_target", 0.95))
        top_scores, ix = jax.vmap(
            lambda s: jax.lax.approx_max_k(s, pre_nms, recall_target=rt)
        )(scores)
    else:
        top_scores, ix = jax.lax.top_k(scores, pre_nms)
    # Decode EVERY anchor first (one fused elementwise pass over [B, A, 4] —
    # sub-ms at 1024²/b96), then gather decoded boxes ONCE. The previous
    # two-gather formulation (deltas by flat index + anchors shared) paid
    # the ~170M rows/s gather-engine row rate twice: gathers here are
    # row-bound, elementwise passes are bandwidth-bound — trading one
    # gather for a decode pass is a net win. Flatten the batch into the
    # gather table: a vmapped take whose operand is batched hits XLA's slow
    # batched-gather path on TPU (~4x, same lesson as
    # batched_multilevel_roi_align). Numerics identical: decode-then-gather
    # applies the same per-element math (proposals_tf.py:157 stddev scale
    # folds into the decode pass).
    flat_ix = ix + (jnp.arange(b, dtype=ix.dtype) * a)[:, None]
    if getattr(config, "proposal_decode_all", True):
        boxes_all = apply_box_deltas(
            jnp.broadcast_to(anchors[None], (b, a, 4)), rpn_deltas * stddev
        )
        boxes_all = clip_boxes(boxes_all, jnp.array([0.0, 0.0, 1.0, 1.0]))
        boxes = jnp.take(boxes_all.reshape(b * a, 4), flat_ix, axis=0)
    else:
        # gather-then-decode (the r2 formulation): two gathers (deltas by
        # flat index + anchors shared-operand) over pre_nms rows only
        top_deltas = jnp.take(
            (rpn_deltas * stddev).reshape(b * a, 4), flat_ix, axis=0
        )
        top_anchors = jnp.take(anchors, ix, axis=0)
        boxes = apply_box_deltas(top_anchors, top_deltas)
        boxes = clip_boxes(boxes, jnp.array([0.0, 0.0, 1.0, 1.0]))

    def per_image(boxes_i, scores_i):
        # both top-k variants emit descending-score order → NMS skips sort
        return nms_boxes(
            boxes_i, scores_i, post_nms, config.rpn_nms_threshold,
            assume_sorted=True,
        )

    return jax.vmap(per_image)(boxes, top_scores)
