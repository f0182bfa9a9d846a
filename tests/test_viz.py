"""Visualization smoke tests (pixel-level assertions, no display)."""

import numpy as np

from objectdetection_tpu import viz


class TestDrawDetections:
    def test_draws_boxes_and_masks(self):
        img = np.zeros((64, 64, 3), np.uint8)
        boxes = np.array([[10, 10, 30, 30]], np.float32)
        masks = np.ones((1, 28, 28), np.float32)
        out = viz.draw_detections(
            img, boxes, np.array([1]), np.array([0.9]),
            class_names=["bg", "thing"], masks=masks,
        )
        assert out.shape == img.shape
        # box edges and mask overlay leave non-black pixels
        assert out[10:30, 10:30].sum() > 0
        assert (out[40:, 40:] == 0).all()  # untouched region stays black

    def test_degenerate_and_out_of_frame_boxes_skipped(self):
        img = np.zeros((32, 32, 3), np.uint8)
        boxes = np.array(
            [[0, 0, 0, 0], [-10, -10, -2, -2], [5, 5, 5, 9]], np.float32
        )
        out = viz.draw_detections(
            img, boxes, np.array([1, 1, 1]), np.array([0.5, 0.5, 0.5])
        )
        assert out.shape == img.shape  # no crash

    def test_anchor_assignment_rendering(self):
        img = np.zeros((64, 64, 3), np.uint8)
        anchors = np.array(
            [[5, 5, 20, 20], [30, 30, 50, 50], [0, 0, 60, 60]], np.float32
        )
        target = np.array([1, -1, 0])
        out = viz.draw_anchor_assignment(
            img, anchors, target, gt_boxes=np.array([[6, 6, 19, 19]])
        )
        # positive anchors leave green pixels, negatives leave red pixels
        assert (out[..., 1] > out[..., 0]).any()
        assert (out[..., 0] > out[..., 1]).any()
        # white GT edges present
        assert (out == 255).all(axis=-1).any()

    def test_random_colors_distinct(self):
        cols = viz.random_colors(12)
        assert len(set(cols)) == 12
