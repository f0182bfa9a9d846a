"""NMS tests: exact agreement with a serial greedy reference implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from objectdetection_tpu.ops import nms


def serial_greedy_nms(boxes, scores, max_output, thresh, class_ids=None):
    """The reference semantics of tf.image.non_max_suppression, in numpy."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for pos, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(i)
        if len(keep) >= max_output:
            break
        for j in order[pos + 1 :]:
            if suppressed[j]:
                continue
            if class_ids is not None and class_ids[i] != class_ids[j]:
                continue
            if _iou(boxes[i], boxes[j]) > thresh:
                suppressed[j] = True
    return keep


def _iou(a, b):
    y1, x1 = max(a[0], b[0]), max(a[1], b[1])
    y2, x2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(y2 - y1, 0) * max(x2 - x1, 0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def random_cluster_boxes(rng, n, clusters=8, scale=1.0):
    """Boxes clustered so NMS actually suppresses."""
    centers = rng.uniform(0.2, 0.8, (clusters, 2))
    idx = rng.randint(0, clusters, n)
    cy, cx = centers[idx, 0], centers[idx, 1]
    cy = cy + rng.normal(0, 0.02, n)
    cx = cx + rng.normal(0, 0.02, n)
    h = rng.uniform(0.05, 0.2, n)
    w = rng.uniform(0.05, 0.2, n)
    boxes = np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], 1)
    return (boxes * scale).astype(np.float32)


class TestAgainstSerialReference:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    @pytest.mark.parametrize("n,tile", [(60, 16), (200, 64), (700, 512)])
    def test_matches_greedy(self, seed, n, tile):
        rng = np.random.RandomState(seed)
        boxes = random_cluster_boxes(rng, n)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        max_out = 50
        expected = serial_greedy_nms(boxes, scores, max_out, 0.5)
        res = nms.non_max_suppression(
            jnp.asarray(boxes), jnp.asarray(scores), max_out, 0.5, tile_size=tile
        )
        got = np.asarray(res.indices)[np.asarray(res.valid)]
        np.testing.assert_array_equal(got, expected)

    def test_class_aware(self):
        rng = np.random.RandomState(7)
        boxes = random_cluster_boxes(rng, 120)
        scores = rng.uniform(0.01, 1.0, 120).astype(np.float32)
        cls = rng.randint(1, 4, 120)
        expected = serial_greedy_nms(boxes, scores, 40, 0.4, class_ids=cls)
        res = nms.non_max_suppression(
            jnp.asarray(boxes),
            jnp.asarray(scores),
            40,
            0.4,
            class_ids=jnp.asarray(cls),
            tile_size=32,
        )
        got = np.asarray(res.indices)[np.asarray(res.valid)]
        np.testing.assert_array_equal(got, expected)

    def test_valid_mask_excludes(self):
        rng = np.random.RandomState(3)
        boxes = random_cluster_boxes(rng, 50)
        scores = rng.uniform(0.01, 1.0, 50).astype(np.float32)
        valid = rng.rand(50) > 0.4
        sub_idx = np.where(valid)[0]
        expected_sub = serial_greedy_nms(boxes[valid], scores[valid], 20, 0.5)
        expected = [sub_idx[i] for i in expected_sub]
        res = nms.non_max_suppression(
            jnp.asarray(boxes), jnp.asarray(scores), 20, 0.5,
            valid=jnp.asarray(valid), tile_size=16,
        )
        got = np.asarray(res.indices)[np.asarray(res.valid)]
        np.testing.assert_array_equal(got, expected)


class TestContract:
    def test_padding_and_order(self):
        boxes = jnp.asarray(
            [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3]], jnp.float32
        )
        scores = jnp.asarray([0.9, 0.8, 0.7])
        res = nms.non_max_suppression(boxes, scores, 5, 0.5)
        np.testing.assert_array_equal(np.asarray(res.indices), [0, 2, -1, -1, -1])
        np.testing.assert_array_equal(np.asarray(res.valid), [1, 1, 0, 0, 0])

    def test_nms_boxes_zero_pads(self):
        boxes = jnp.asarray([[0, 0, 1, 1], [0, 0, 1, 1]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8])
        out = nms.nms_boxes(boxes, scores, 4, 0.5)
        assert out.shape == (4, 4)
        np.testing.assert_allclose(np.asarray(out)[0], [0, 0, 1, 1])
        np.testing.assert_array_equal(np.asarray(out)[1:], 0.0)

    def test_jit_and_vmap(self):
        rng = np.random.RandomState(11)
        boxes = jnp.asarray(
            np.stack([random_cluster_boxes(rng, 64) for _ in range(4)])
        )
        scores = jnp.asarray(rng.uniform(0, 1, (4, 64)).astype(np.float32))
        fn = jax.jit(
            jax.vmap(lambda b, s: nms.nms_boxes(b, s, 10, 0.5, tile_size=32))
        )
        out = fn(boxes, scores)
        assert out.shape == (4, 10, 4)
