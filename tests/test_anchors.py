"""Anchor-generation tests against the reference's documented counts.

Golden counts come from the reference's committed log
(`MaskRCNN/building_blocks/logfile.log:1-32`): 4,092 anchors at 128² and
261,888 at 1024² (`proposals_tf.py:143`).
"""

import numpy as np

from objectdetection_tpu import anchors
from objectdetection_tpu.config import COCO_CONFIG, SHAPES_CONFIG


class TestCounts:
    def test_shapes_config_total(self):
        a = anchors.config_anchors(SHAPES_CONFIG)
        assert a.shape == (4092, 4)

    def test_shapes_per_level(self):
        counts = anchors.anchors_per_level_counts(SHAPES_CONFIG)
        assert counts == (3072, 768, 192, 48, 12)

    def test_coco_config_total(self):
        a = anchors.config_anchors(COCO_CONFIG)
        assert a.shape == (261888, 4)
        assert 3 * 256 * 256 == anchors.anchors_per_level_counts(COCO_CONFIG)[0]


class TestGeometryOfAnchors:
    def test_level_anchor_shapes(self):
        # scale 128, ratios [0.5,1,2]: h = s/sqrt(r), w = s*sqrt(r)
        a = anchors.anchors_for_level(128, [0.5, 1, 2], (4, 4), 16)
        assert a.shape == (4 * 4 * 3, 4)
        h = a[:, 2] - a[:, 0]
        w = a[:, 3] - a[:, 1]
        np.testing.assert_allclose(
            sorted(set(np.round(h, 2))), sorted({128 / np.sqrt(r) for r in [0.5, 1, 2]}),
            rtol=1e-4,
        )
        np.testing.assert_allclose(h * w, 128 * 128, rtol=1e-5)

    def test_first_anchor_centered_at_origin(self):
        a = anchors.anchors_for_level(32, [1.0], (8, 8), 4)
        np.testing.assert_allclose(a[0], [-16, -16, 16, 16], rtol=1e-6)

    def test_ordering_is_y_x_anchor(self):
        # second anchor group should be shifted by stride in x
        a = anchors.anchors_for_level(32, [0.5, 1, 2], (8, 8), 4)
        np.testing.assert_allclose(a[3] - a[0], [0, 4, 0, 4], atol=1e-6)
        # row stride: after 8 positions * 3 anchors, shift by stride in y
        np.testing.assert_allclose(a[24] - a[0], [4, 0, 4, 0], atol=1e-6)

    def test_normalized_within_reference_convention(self):
        a = anchors.config_anchors(SHAPES_CONFIG, normalized=True)
        pix = anchors.config_anchors(SHAPES_CONFIG, normalized=False)
        expected = (pix - np.array([0, 0, 1, 1])) / 127.0
        np.testing.assert_allclose(a, expected, rtol=1e-5)
