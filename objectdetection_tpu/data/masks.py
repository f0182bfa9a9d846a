"""Instance-mask utilities: mini-masks and full-image expansion.

≙ the reference `utils.resize_mask` / `minimize_mask` (utils.py:123-152) and
the implied `expand_masks` inverse. Mini-masks store each instance's mask
cropped to its box at a small fixed resolution (config.mini_mask_shape, 56²)
to cut data-pipeline memory (config.py:55-58); they expand back to image
coordinates for visualization/eval.

Implemented with `jax.image.resize` so the same functions work on host numpy
arrays and inside jitted pipelines.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def minimize_masks(
    boxes: Array, masks: Array, mini_shape: Tuple[int, int]
) -> Array:
    """Crop each instance mask to its box, resized to mini_shape.

    Args:
      boxes: [N, 4] pixel (y1, x1, y2, x2) — y2/x2 exclusive as in the
        reference's extract_bboxes.
      masks: [N, H, W] {0,1}.
      mini_shape: (mh, mw).

    Returns [N, mh, mw] float32. ≙ utils.minimize_mask (utils.py:135-152) but
    batched and jit-friendly (normalized crop_and_resize instead of slicing).
    """
    from objectdetection_tpu.ops.roi_align import crop_and_resize

    n, h, w = masks.shape
    # pixel box → normalized corner-aligned coordinates over (h-1, w-1);
    # exclusive y2 → inclusive last row y2-1
    boxes = jnp.asarray(boxes, jnp.float32)
    norm = jnp.stack(
        [
            boxes[:, 0] / (h - 1),
            boxes[:, 1] / (w - 1),
            (boxes[:, 2] - 1) / (h - 1),
            (boxes[:, 3] - 1) / (w - 1),
        ],
        axis=1,
    )

    def one(mask, box):
        return crop_and_resize(mask[:, :, None], box[None], mini_shape)[0, :, :, 0]

    out = jax.vmap(one)(jnp.asarray(masks, jnp.float32), norm)
    return jnp.round(out)


def expand_masks(
    boxes: Array, mini_masks: Array, image_shape: Tuple[int, int]
) -> Array:
    """Paste mini-masks back into full-image frames: [N, H, W] float32.

    Inverse of :func:`minimize_masks` (the reference names it expand_masks in
    matterport but never shipped it). Host-side (numpy loop) — used for
    visualization and eval, not in the jitted path.
    """
    import cv2

    boxes = np.asarray(boxes)
    mini = np.asarray(mini_masks, np.float32)
    h, w = image_shape
    n = mini.shape[0]
    out = np.zeros((n, h, w), np.float32)
    for i in range(n):
        y1, x1, y2, x2 = [int(round(v)) for v in boxes[i]]
        y1, x1 = max(y1, 0), max(x1, 0)
        y2, x2 = min(y2, h), min(x2, w)
        if y2 <= y1 or x2 <= x1:
            continue
        m = cv2.resize(mini[i], (x2 - x1, y2 - y1))
        out[i, y1:y2, x1:x2] = np.round(m)
    return out


def paste_detection_masks(
    soft_masks: Array,
    boxes: Array,
    image_shape: Tuple[int, int],
    threshold: float = 0.5,
) -> np.ndarray:
    """Project per-detection 28² soft masks into full-image binary masks.

    The final unmold step the reference's commented-out mask path implied:
    [N, mh, mw] sigmoid outputs + [N, 4] pixel boxes → [N, H, W] bool.
    """
    import cv2

    boxes = np.asarray(boxes)
    soft = np.asarray(soft_masks, np.float32)
    h, w = image_shape
    n = soft.shape[0]
    out = np.zeros((n, h, w), bool)
    for i in range(n):
        y1, x1, y2, x2 = [int(round(v)) for v in boxes[i]]
        y1, x1 = max(y1, 0), max(x1, 0)
        y2, x2 = min(y2, h), min(x2, w)
        if y2 <= y1 or x2 <= x1:
            continue
        m = cv2.resize(soft[i], (x2 - x1, y2 - y1))
        out[i, y1:y2, x1:x2] = m >= threshold
    return out
