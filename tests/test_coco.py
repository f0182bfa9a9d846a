"""COCO reader + eval-driver tests on a synthesized mini dataset."""

import json
import os

import numpy as np
import pytest

from objectdetection_tpu.config import SHAPES_CONFIG
from objectdetection_tpu.data.coco import CocoDataset, eval_batch


@pytest.fixture(scope="module")
def mini_coco(tmp_path_factory):
    """Two tiny images + annotations in standard instances_*.json layout."""
    import cv2

    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i, (h, w) in enumerate([(96, 128), (80, 80)]):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"img{i}.jpg"), img)
        images.append(
            dict(id=i + 1, file_name=f"img{i}.jpg", height=h, width=w)
        )
    annotations = [
        dict(id=1, image_id=1, category_id=7, bbox=[10, 20, 30, 40], iscrowd=0),
        dict(id=2, image_id=1, category_id=3, bbox=[5, 5, 10, 10], iscrowd=0),
        dict(id=3, image_id=2, category_id=3, bbox=[0, 0, 50, 50], iscrowd=1),
    ]
    categories = [
        dict(id=3, name="car"),
        dict(id=7, name="train"),
    ]
    ann_file = root / "instances.json"
    with open(ann_file, "w") as f:
        json.dump(
            dict(images=images, annotations=annotations, categories=categories), f
        )
    return str(ann_file), str(img_dir)


class TestCocoDataset:
    def test_category_mapping_by_ascending_id(self, mini_coco):
        ds = CocoDataset(*mini_coco)
        assert ds.class_names == ["BG", "car", "train"]
        assert ds.num_classes == 3

    def test_annotations_xywh_to_yxyx(self, mini_coco):
        ds = CocoDataset(*mini_coco)
        boxes, ids = ds.annotations(1)
        assert boxes.shape == (2, 4)
        # bbox [x=10, y=20, w=30, h=40] → [y1=20, x1=10, y2=60, x2=40]
        np.testing.assert_allclose(boxes[0], [20, 10, 60, 40])
        assert ids[0] == 2  # category 7 → second class

    def test_crowd_excluded_from_gt_but_kept_as_ignore(self, mini_coco):
        ds = CocoDataset(*mini_coco)
        boxes, _ = ds.annotations(2)
        assert len(boxes) == 0
        cboxes, cids = ds.crowd_regions(2)
        assert len(cboxes) == 1
        np.testing.assert_allclose(cboxes[0], [0, 0, 50, 50])
        assert cids[0] == 1  # category 3 → class 1

    def test_image_loading(self, mini_coco):
        ds = CocoDataset(*mini_coco)
        img = ds.image(1)
        assert img.shape == (96, 128, 3)

    def test_train_batch_geometry(self, mini_coco):
        from objectdetection_tpu.data.coco import train_batch
        from objectdetection_tpu.config import SHAPES_CONFIG

        ds = CocoDataset(*mini_coco)
        cfg = SHAPES_CONFIG.replace(num_classes=3, max_gt_objects=4)
        batch = train_batch(ds, [1], cfg, with_masks=False)
        assert batch.images.shape == (1, 128, 128, 3)
        # image 1 is 96x128 → scale 1, window top pad (128-96)//2 = 16
        # gt bbox [x=10,y=20,w=30,h=40] → pixel y1=20+16=36, x1=10
        got = batch.gt_boxes[0, 0] * 127.0 + np.array([0, 0, 1, 1])
        np.testing.assert_allclose(got, [36, 10, 76, 40], atol=0.5)
        assert batch.gt_class_ids[0, 0] == 2
        assert (batch.gt_class_ids[0, 2:] == 0).all()

    def test_eval_batch_molding(self, mini_coco):
        ds = CocoDataset(*mini_coco)
        cfg = SHAPES_CONFIG  # 128² target canvas
        images, windows, shapes = eval_batch(ds, [1, 2], cfg)
        assert images.shape == (2, 128, 128, 3)
        np.testing.assert_array_equal(shapes, [[96, 128], [80, 80]])
        # image 1: 96x128 → scale 1.0 (min_dim already ≥128? no — min is 96;
        # scale = max(1, 128/96) capped by 128/128=1 → 1.0), centered pad
        y1, x1, y2, x2 = windows[0]
        assert x2 - x1 == 128 and y2 - y1 == 96
