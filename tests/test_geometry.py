"""Geometry unit tests with numpy golden references.

The golden implementations re-derive the reference's numerics
(`MaskRCNN/building_blocks/utils.py`, `proposals_tf.py`) independently in
numpy so the jnp versions are checked against a second implementation.
"""

import numpy as np
import pytest

from objectdetection_tpu import geometry


rng = np.random.RandomState(0)


def random_boxes(n, scale=100.0):
    y1 = rng.uniform(0, scale, n)
    x1 = rng.uniform(0, scale, n)
    h = rng.uniform(1, scale / 2, n)
    w = rng.uniform(1, scale / 2, n)
    return np.stack([y1, x1, y1 + h, x1 + w], axis=1).astype(np.float32)


def np_iou_single(box, boxes):
    y1 = np.maximum(box[0], boxes[:, 0])
    x1 = np.maximum(box[1], boxes[:, 1])
    y2 = np.minimum(box[2], boxes[:, 2])
    x2 = np.minimum(box[3], boxes[:, 3])
    inter = np.maximum(y2 - y1, 0) * np.maximum(x2 - x1, 0)
    a1 = (box[2] - box[0]) * (box[3] - box[1])
    a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / (a1 + a2 - inter)


class TestNormDenorm:
    def test_norm_boxes_matches_reference_convention(self):
        # utils.py:181-196: scale (h-1, w-1), shift [0,0,1,1]
        boxes = np.array([[0.0, 0.0, 1024.0, 1024.0], [10, 20, 110, 220]], np.float32)
        out = np.asarray(geometry.norm_boxes(boxes, (1024, 1024)))
        expected = (boxes - np.array([0, 0, 1, 1])) / np.array(
            [1023.0, 1023, 1023, 1023]
        )
        np.testing.assert_allclose(out, expected, rtol=1e-6)

    def test_roundtrip(self):
        boxes = random_boxes(50, 900)
        n = np.asarray(geometry.norm_boxes(boxes, (1024, 768)))
        d = np.asarray(geometry.denorm_boxes(n, (1024, 768)))
        np.testing.assert_allclose(d, np.round(boxes), atol=1)


class TestDeltas:
    def test_decode_inverts_encode(self):
        src = random_boxes(64)
        dst = random_boxes(64)
        deltas = np.asarray(geometry.encode_box_deltas(src, dst))
        rec = np.asarray(geometry.apply_box_deltas(src, deltas))
        np.testing.assert_allclose(rec, dst, rtol=1e-4, atol=1e-3)

    def test_decode_matches_reference_center_form(self):
        # proposals_tf.py:46-61 arithmetic, independently in numpy
        boxes = random_boxes(32)
        deltas = rng.uniform(-0.2, 0.2, (32, 4)).astype(np.float32)
        h = boxes[:, 2] - boxes[:, 0]
        w = boxes[:, 3] - boxes[:, 1]
        cy = boxes[:, 0] + 0.5 * h + deltas[:, 0] * h
        cx = boxes[:, 1] + 0.5 * w + deltas[:, 1] * w
        nh = h * np.exp(deltas[:, 2])
        nw = w * np.exp(deltas[:, 3])
        expected = np.stack(
            [cy - 0.5 * nh, cx - 0.5 * nw, cy + 0.5 * nh, cx + 0.5 * nw], axis=1
        )
        out = np.asarray(geometry.apply_box_deltas(boxes, deltas))
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-4)

    def test_batched_shapes(self):
        boxes = random_boxes(24).reshape(2, 3, 4, 4)
        deltas = rng.uniform(-0.1, 0.1, (2, 3, 4, 4)).astype(np.float32)
        out = geometry.apply_box_deltas(boxes, deltas)
        assert out.shape == (2, 3, 4, 4)


class TestIoU:
    def test_against_single_box_reference(self):
        a = random_boxes(20)
        b = random_boxes(30)
        mat = np.asarray(geometry.iou_matrix(a, b))
        assert mat.shape == (20, 30)
        for i in range(20):
            np.testing.assert_allclose(mat[i], np_iou_single(a[i], b), rtol=1e-5)

    def test_degenerate_boxes_zero(self):
        a = np.zeros((3, 4), np.float32)
        b = random_boxes(5)
        mat = np.asarray(geometry.iou_matrix(a, b))
        np.testing.assert_array_equal(mat, 0.0)

    def test_self_iou_diagonal_one(self):
        a = random_boxes(10)
        mat = np.asarray(geometry.pairwise_iou(a))
        np.testing.assert_allclose(np.diag(mat), 1.0, rtol=1e-5)


class TestClip:
    def test_clip_to_unit_window(self):
        boxes = np.array(
            [[-0.5, 0.2, 0.5, 1.5], [0.1, 0.1, 0.4, 0.4]], np.float32
        )
        out = np.asarray(geometry.clip_boxes(boxes, [0, 0, 1, 1]))
        np.testing.assert_allclose(out[0], [0, 0.2, 0.5, 1.0], rtol=1e-6)
        np.testing.assert_allclose(out[1], boxes[1], rtol=1e-6)
