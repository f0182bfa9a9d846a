"""Detection visualization.

≙ the reference `MaskRCNN/visualize.py:59-188` (matplotlib boxes with random
colors) — plus the mask overlay the reference left commented out.
"""

from __future__ import annotations

import colorsys
from typing import Optional, Sequence

import numpy as np


def random_colors(n: int, seed: int = 0, bright: bool = True):
    """N visually-distinct RGB colors via evenly spaced hues (visualize.py:24-33)."""
    rng = np.random.RandomState(seed)
    brightness = 1.0 if bright else 0.7
    hsv = [(i / max(n, 1), 1, brightness) for i in range(n)]
    colors = [colorsys.hsv_to_rgb(*c) for c in hsv]
    rng.shuffle(colors)
    return colors


def draw_anchor_assignment(
    image: np.ndarray,
    anchors: np.ndarray,
    target_class: np.ndarray,
    gt_boxes: Optional[np.ndarray] = None,
    max_negative: int = 50,
) -> np.ndarray:
    """Render RPN target assignment: GT (white), positive anchors (green),
    a sample of negatives (red). ≙ the reference's viz-iou-dummy notebook.

    anchors: [A, 4] pixel coords; target_class: [A] in {-1, 0, 1}.
    """
    import cv2

    out = image.astype(np.uint8).copy()

    def draw(boxes, color, thickness=1):
        for y1, x1, y2, x2 in np.asarray(boxes, np.int32):
            cv2.rectangle(out, (x1, y1), (x2, y2), color, thickness)

    neg = anchors[target_class == -1]
    if len(neg) > max_negative:
        neg = neg[:: max(len(neg) // max_negative, 1)][:max_negative]
    draw(neg, (220, 60, 60))
    draw(anchors[target_class == 1], (40, 220, 40))
    if gt_boxes is not None:
        draw(gt_boxes, (255, 255, 255), 2)
    return out


def draw_detections(
    image: np.ndarray,
    boxes: np.ndarray,
    class_ids: np.ndarray,
    scores: np.ndarray,
    class_names: Optional[Sequence[str]] = None,
    masks: Optional[np.ndarray] = None,
    mask_threshold: float = 0.5,
) -> np.ndarray:
    """Render boxes (+ optional masks) onto an image; returns a new uint8 array.

    boxes: [N, 4] pixel (y1, x1, y2, x2); masks: [N, mh, mw] per-roi soft masks
    (resized into each box).
    """
    import cv2

    out = image.astype(np.uint8).copy()
    colors = random_colors(max(len(boxes), 1))
    h, w = out.shape[:2]
    for i, (y1, x1, y2, x2) in enumerate(np.asarray(boxes, np.int32)):
        color = tuple(int(255 * c) for c in colors[i % len(colors)])
        y1, x1 = max(y1, 0), max(x1, 0)
        y2, x2 = min(y2, h - 1), min(x2, w - 1)
        if y2 <= y1 or x2 <= x1:
            continue
        cv2.rectangle(out, (x1, y1), (x2, y2), color, 1)
        label = (
            class_names[int(class_ids[i])]
            if class_names
            else str(int(class_ids[i]))
        )
        cv2.putText(
            out,
            f"{label} {scores[i]:.2f}",
            (x1, max(y1 - 3, 10)),
            cv2.FONT_HERSHEY_SIMPLEX,
            0.35,
            color,
            1,
        )
        if masks is not None:
            mh, mw = masks[i].shape
            mask = cv2.resize(
                masks[i].astype(np.float32), (x2 - x1, y2 - y1)
            )
            region = out[y1:y2, x1:x2].astype(np.float32)
            alpha = (mask > mask_threshold)[:, :, None] * 0.45
            region = region * (1 - alpha) + np.array(color, np.float32) * alpha
            out[y1:y2, x1:x2] = region.astype(np.uint8)
    return out
