"""Mini-mask roundtrip and detection-mask pasting tests."""

import jax.numpy as jnp
import numpy as np

from objectdetection_tpu.data.masks import (
    expand_masks,
    minimize_masks,
    paste_detection_masks,
)


def square_mask(h, w, y1, x1, y2, x2):
    m = np.zeros((h, w), np.float32)
    m[y1:y2, x1:x2] = 1.0
    return m


class TestMiniMasks:
    def test_roundtrip_square(self):
        h = w = 64
        mask = square_mask(h, w, 10, 14, 40, 50)[None]
        boxes = np.array([[10, 14, 40, 50]], np.float32)
        mini = np.asarray(minimize_masks(jnp.asarray(boxes), jnp.asarray(mask), (28, 28)))
        assert mini.shape == (1, 28, 28)
        # a box-tight square mask minimizes to (nearly) all ones
        assert mini.mean() > 0.95
        back = expand_masks(boxes, mini, (h, w))
        inter = ((back[0] > 0.5) & (mask[0] > 0.5)).sum()
        union = ((back[0] > 0.5) | (mask[0] > 0.5)).sum()
        assert inter / union > 0.9

    def test_half_filled_structure_preserved(self):
        h = w = 64
        mask = square_mask(h, w, 10, 10, 40, 25)[None]  # left half of the box
        boxes = np.array([[10, 10, 40, 40]], np.float32)
        mini = np.asarray(minimize_masks(jnp.asarray(boxes), jnp.asarray(mask), (28, 28)))
        left = mini[0, :, :12].mean()
        right = mini[0, :, 16:].mean()
        assert left > 0.9 and right < 0.1


class TestPasteMasks:
    def test_paste_into_boxes(self):
        soft = np.ones((2, 28, 28), np.float32) * 0.9
        boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 40]], np.float32)
        out = paste_detection_masks(soft, boxes, (48, 48))
        assert out.shape == (2, 48, 48)
        assert out[0, :10, :10].all() and not out[0, 10:, :].any()
        assert out[1, 20:30, 20:40].all()

    def test_degenerate_box_empty(self):
        soft = np.ones((1, 28, 28), np.float32)
        out = paste_detection_masks(soft, np.zeros((1, 4)), (32, 32))
        assert not out.any()
