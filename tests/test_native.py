"""Native C++ shapes rasterizer vs the Python/cv2 reference path."""

import numpy as np
import pytest

from objectdetection_tpu.config import SHAPES_CONFIG
from objectdetection_tpu.data.shapes import ShapesDataset

try:
    from objectdetection_tpu.native import native_available

    HAVE_NATIVE = native_available()
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(
    not HAVE_NATIVE, reason="native rasterizer did not build"
)


class TestNativeVsPython:
    def setup_method(self):
        self.ds = ShapesDataset(6, 128, 128, seed=21)
        self.cfg = SHAPES_CONFIG

    def test_batch_structure_and_agreement(self):
        ids = list(range(6))
        nat = self.ds.load_batch(ids, self.cfg, with_masks=True, use_native=True)
        py = self.ds.load_batch(ids, self.cfg, with_masks=True, use_native=False)
        assert nat.images.shape == py.images.shape
        assert nat.gt_boxes.shape == py.gt_boxes.shape

        for bi in range(6):
            # same surviving instances and classes
            np.testing.assert_array_equal(
                nat.gt_class_ids[bi], py.gt_class_ids[bi]
            )
            # images nearly identical (rasterization edge differences only)
            diff = np.abs(nat.images[bi] - py.images[bi]).max(axis=-1) > 1
            assert diff.mean() < 0.02, f"image {bi}: {diff.mean():.3f}"
            # boxes within 2px (normalized)
            valid = py.gt_class_ids[bi] > 0
            np.testing.assert_allclose(
                nat.gt_boxes[bi][valid], py.gt_boxes[bi][valid], atol=2 / 127.0
            )
            # mask IoU per instance > 0.93
            for j in np.where(valid)[0]:
                a = nat.gt_masks[bi, j] > 0.5
                b = py.gt_masks[bi, j] > 0.5
                inter = (a & b).sum()
                union = (a | b).sum()
                assert union == 0 or inter / union > 0.93

    def test_native_faster_or_equal_shape_contract(self):
        ids = list(range(6))
        nat = self.ds.load_batch(ids, self.cfg, use_native=True)
        assert nat.images.dtype == np.float32
        assert (nat.gt_boxes >= 0).all() and (nat.gt_boxes <= 1).all()
