"""Pure-jnp box geometry.

The numerical conventions exactly follow the reference (so outputs are
comparable bit-for-box) but every function here is batched, jit-friendly and
shape-static — no Python loops over boxes/images:

- boxes are ``(y1, x1, y2, x2)``; normalized coordinates use the reference's
  ``(h-1, w-1)`` scale with a ``[0, 0, 1, 1]`` shift
  (``MaskRCNN/building_blocks/utils.py:181-227``)
- deltas are ``(dy, dx, log(dh), log(dw))`` in center form
  (``proposals_tf.py:23-65``)
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def norm_boxes(boxes: Array, image_shape) -> Array:
    """Pixel → normalized coordinates. ≙ utils.py:181-196.

    boxes: [..., 4] (y1, x1, y2, x2) in pixels; image_shape: (h, w).
    In pixel coords (y2, x2) is *outside* the box; normalized it's inside,
    hence the [0, 0, 1, 1] shift.
    """
    h, w = image_shape[0], image_shape[1]
    scale = jnp.array([h - 1, w - 1, h - 1, w - 1], dtype=jnp.float32)
    shift = jnp.array([0.0, 0.0, 1.0, 1.0], dtype=jnp.float32)
    return ((boxes - shift) / scale).astype(jnp.float32)


def denorm_boxes(boxes: Array, image_shape, round: bool = True) -> Array:
    """Normalized → pixel coordinates. ≙ utils.py:212-227."""
    h, w = image_shape[0], image_shape[1]
    scale = jnp.array([h - 1, w - 1, h - 1, w - 1], dtype=jnp.float32)
    shift = jnp.array([0.0, 0.0, 1.0, 1.0], dtype=jnp.float32)
    out = boxes * scale + shift
    if round:
        return jnp.around(out).astype(jnp.int32)
    return out


def apply_box_deltas(boxes: Array, deltas: Array) -> Array:
    """Decode (dy, dx, log dh, log dw) deltas onto anchor boxes.

    ≙ proposals_tf.py:23-65. Works on any leading batch shape: [..., 4].
    """
    height = boxes[..., 2] - boxes[..., 0]
    width = boxes[..., 3] - boxes[..., 1]
    center_y = boxes[..., 0] + 0.5 * height
    center_x = boxes[..., 1] + 0.5 * width

    center_y = center_y + deltas[..., 0] * height
    center_x = center_x + deltas[..., 1] * width
    height = height * jnp.exp(deltas[..., 2])
    width = width * jnp.exp(deltas[..., 3])

    y1 = center_y - 0.5 * height
    x1 = center_x - 0.5 * width
    y2 = y1 + height
    x2 = x1 + width
    return jnp.stack([y1, x1, y2, x2], axis=-1)


def encode_box_deltas(boxes: Array, gt_boxes: Array) -> Array:
    """Encode refinement deltas taking `boxes` onto `gt_boxes`.

    ≙ the reference's `box_refinement_tf` (data_processor.py:443-471) and the
    host-side target deltas (data_processor.py:266-292). Inputs [..., 4].
    """
    height = boxes[..., 2] - boxes[..., 0]
    width = boxes[..., 3] - boxes[..., 1]
    center_y = boxes[..., 0] + 0.5 * height
    center_x = boxes[..., 1] + 0.5 * width

    gt_height = gt_boxes[..., 2] - gt_boxes[..., 0]
    gt_width = gt_boxes[..., 3] - gt_boxes[..., 1]
    gt_center_y = gt_boxes[..., 0] + 0.5 * gt_height
    gt_center_x = gt_boxes[..., 1] + 0.5 * gt_width

    dy = (gt_center_y - center_y) / height
    dx = (gt_center_x - center_x) / width
    dh = jnp.log(gt_height / height)
    dw = jnp.log(gt_width / width)
    return jnp.stack([dy, dx, dh, dw], axis=-1)


def clip_boxes(boxes: Array, window) -> Array:
    """Clip boxes to a (y1, x1, y2, x2) window. ≙ proposals_tf.py:67-94."""
    window = jnp.asarray(window, dtype=boxes.dtype)
    wy1, wx1, wy2, wx2 = window[..., 0], window[..., 1], window[..., 2], window[..., 3]
    y1 = jnp.clip(boxes[..., 0], wy1, wy2)
    x1 = jnp.clip(boxes[..., 1], wx1, wx2)
    y2 = jnp.clip(boxes[..., 2], wy1, wy2)
    x2 = jnp.clip(boxes[..., 3], wx1, wx2)
    return jnp.stack([y1, x1, y2, x2], axis=-1)


def box_area(boxes: Array) -> Array:
    """[..., 4] → [...] areas (0 for degenerate boxes)."""
    h = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    w = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return h * w


def iou_matrix(boxes_a: Array, boxes_b: Array) -> Array:
    """Dense pairwise IoU: [A, 4] × [B, 4] → [A, B].

    Replaces the reference's per-GT Python loop
    (data_processor.py:209-213) and tiled-tensor IoU
    (data_processor.py:473-510) with one broadcasted reduction — this runs
    on-device over the full anchor axis.
    """
    a = boxes_a[:, None, :]  # [A, 1, 4]
    b = boxes_b[None, :, :]  # [1, B, 4]
    inter_y1 = jnp.maximum(a[..., 0], b[..., 0])
    inter_x1 = jnp.maximum(a[..., 1], b[..., 1])
    inter_y2 = jnp.minimum(a[..., 2], b[..., 2])
    inter_x2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.maximum(inter_y2 - inter_y1, 0.0) * jnp.maximum(
        inter_x2 - inter_x1, 0.0
    )
    area_a = box_area(boxes_a)[:, None]
    area_b = box_area(boxes_b)[None, :]
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def pairwise_iou(boxes: Array) -> Array:
    """[N, 4] → [N, N] self-IoU (used by NMS)."""
    return iou_matrix(boxes, boxes)
