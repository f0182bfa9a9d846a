"""Synthetic shapes dataset (procedural squares / circles / triangles).

≙ the reference `MaskRCNN/shapes.py:54-214`: random background color, 1-4
shapes with random color/center/size, heavily-overlapping ground truths
pruned with NMS at IoU 0.3, occlusion-aware instance masks (later shapes
occlude earlier ones), class ids {1: square, 2: circle, 3: triangle}.

Differences by design:
- deterministic via an explicit ``numpy.random.Generator`` seed per dataset
  (the reference re-seeds the global `random` module inside the generator,
  `shapes.py:127`, making every image identical),
- emits fixed-shape, zero-padded batches ready for the jitted train step
  (`TrainBatch`), no host-side target building.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

from objectdetection_tpu.config import DetectorConfig

CLASS_NAMES = ("bg", "square", "circle", "triangle")


def _draw_shape(canvas: np.ndarray, shape: str, color, dims) -> np.ndarray:
    """Rasterize one shape onto `canvas` (any channel count)."""
    import cv2

    c_y, c_x, size = dims
    if shape == "square":
        cv2.rectangle(
            canvas, (c_x - size, c_y - size), (c_x + size, c_y + size), color, -1
        )
    elif shape == "circle":
        cv2.circle(canvas, (c_x, c_y), size, color, -1)
    elif shape == "triangle":
        s = size / math.sin(math.radians(60))
        pts = np.array(
            [[(c_x, c_y - size), (int(c_x - s), c_y + size), (int(c_x + s), c_y + size)]],
            dtype=np.int32,
        )
        cv2.fillPoly(canvas, pts, color)
    else:
        raise ValueError(shape)
    return canvas


def _np_nms_keep(boxes: np.ndarray, thresh: float) -> List[int]:
    """Greedy NMS keep-list (order = given order). ≙ utils.non_max_supression."""
    keep, suppressed = [], set()
    for i in range(len(boxes)):
        if i in suppressed:
            continue
        keep.append(i)
        for j in range(i + 1, len(boxes)):
            if j in suppressed:
                continue
            y1 = max(boxes[i][0], boxes[j][0])
            x1 = max(boxes[i][1], boxes[j][1])
            y2 = min(boxes[i][2], boxes[j][2])
            x2 = min(boxes[i][3], boxes[j][3])
            inter = max(y2 - y1, 0) * max(x2 - x1, 0)
            a = (boxes[i][2] - boxes[i][0]) * (boxes[i][3] - boxes[i][1])
            b = (boxes[j][2] - boxes[j][0]) * (boxes[j][3] - boxes[j][1])
            if inter / (a + b - inter) > thresh:
                suppressed.add(j)
    return keep


@dataclass
class ShapesDataset:
    """Procedural dataset; one spec dict per image, rasterized on demand."""

    num_images: int
    height: int = 128
    width: int = 128
    seed: int = 0
    max_instances: int = 4
    image_meta: Dict[int, dict] = field(default_factory=dict)

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        for i in range(self.num_images):
            self.image_meta[i] = self._spec(rng)

    @property
    def num_classes(self) -> int:
        return len(CLASS_NAMES)

    def _spec(self, rng: np.random.Generator) -> dict:
        h, w = self.height, self.width
        bg_color = rng.integers(0, 256, 3).tolist()
        num_objects = int(rng.integers(1, self.max_instances + 1))
        # reference uses a 20px margin at 128² (shapes.py:117); scale down for
        # smaller canvases so the sampling ranges stay valid
        buffer = min(20, max(4, h // 8))
        instances = []
        boxes = []
        for _ in range(num_objects):
            shape = CLASS_NAMES[1:][int(rng.integers(0, 3))]
            color = tuple(int(c) for c in rng.integers(0, 256, 3))
            c_y = int(rng.integers(buffer, h - buffer))
            c_x = int(rng.integers(buffer, w - buffer))
            size = int(rng.integers(buffer, h // 4 + 1))
            instances.append((shape, color, (c_y, c_x, size)))
            boxes.append([c_y - size, c_x - size, c_y + size, c_x + size])
        keep = _np_nms_keep(np.array(boxes, np.float32), 0.3)
        return dict(bg_color=bg_color, instances=[instances[i] for i in keep])

    def image(self, image_id: int) -> np.ndarray:
        info = self.image_meta[image_id]
        img = np.ones((self.height, self.width, 3), np.uint8) * np.array(
            info["bg_color"], np.uint8
        )
        for shape, color, dims in info["instances"]:
            img = _draw_shape(img, shape, color, dims)
        return img

    def masks(self, image_id: int) -> Tuple[np.ndarray, np.ndarray]:
        """Occlusion-aware instance masks [H, W, N] + class ids [N].

        ≙ shapes.get_object_mask (shapes.py:168-191): later instances occlude
        earlier ones.
        """
        info = self.image_meta[image_id]
        n = len(info["instances"])
        mask = np.zeros((self.height, self.width, n), np.uint8)
        for i, (shape, _, dims) in enumerate(info["instances"]):
            mask[:, :, i : i + 1] = _draw_shape(
                np.ascontiguousarray(mask[:, :, i : i + 1]), shape, 1, dims
            )
        occlusion = np.logical_not(mask[:, :, -1]).astype(np.uint8)
        for i in range(n - 2, -1, -1):
            mask[:, :, i] = mask[:, :, i] * occlusion
            occlusion = np.logical_and(occlusion, np.logical_not(mask[:, :, i]))
        class_ids = np.array(
            [CLASS_NAMES.index(s[0]) for s in info["instances"]], np.int32
        )
        return mask.astype(bool), class_ids

    def bboxes_from_masks(self, masks: np.ndarray) -> np.ndarray:
        """Tight boxes (y1, x1, y2, x2) from instance masks.

        ≙ data_processor.extract_bboxes (data_processor.py:149-169): empty
        (fully occluded) instances get a zero box.
        """
        n = masks.shape[-1]
        out = np.zeros((n, 4), np.int32)
        for i in range(n):
            ys, xs = np.where(masks[:, :, i])
            if len(ys):
                out[i] = [ys.min(), xs.min(), ys.max() + 1, xs.max() + 1]
        return out

    # ------------------------------------------------------------------
    # batching for the jitted train step
    # ------------------------------------------------------------------

    def load_batch(
        self,
        image_ids,
        config: DetectorConfig,
        with_masks: bool = True,
        use_native: bool | None = None,
    ):
        """Assemble a fixed-shape, zero-padded training batch (numpy).

        `use_native=None` auto-selects the C++ batch rasterizer
        (`objectdetection_tpu.native`) when its .so builds; the Python/cv2
        path is the fallback and the behavioral reference.
        """
        if use_native is None:
            try:
                from objectdetection_tpu.native import native_available

                use_native = native_available()
            except Exception:
                use_native = False
        if use_native:
            return self._load_batch_native(image_ids, config, with_masks)
        return self._load_batch_python(image_ids, config, with_masks)

    def _load_batch_native(self, image_ids, config, with_masks):
        from objectdetection_tpu.detector import TrainBatch
        from objectdetection_tpu.native import rasterize_shapes_batch

        b = len(image_ids)
        h, w = config.image_shape[:2]
        g = config.max_gt_objects
        max_inst = max(
            g, max(len(self.image_meta[i]["instances"]) for i in image_ids)
        )
        specs = np.zeros((b, max_inst, 7), np.int32)
        bg = np.zeros((b, 3), np.int32)
        for bi, img_id in enumerate(image_ids):
            info = self.image_meta[img_id]
            bg[bi] = info["bg_color"]
            for j, (shape, color, (cy, cx, size)) in enumerate(
                info["instances"][:max_inst]
            ):
                specs[bi, j] = [
                    CLASS_NAMES.index(shape), cy, cx, size, *color
                ]
        images, masks, boxes, classes = rasterize_shapes_batch(
            specs, bg, h, w, config.mean_pixel
        )
        active = np.zeros((b, config.num_classes), np.int32)
        active[:, : self.num_classes] = 1
        return TrainBatch(
            images=images,
            gt_boxes=boxes[:, :g],
            gt_class_ids=classes[:, :g],
            gt_masks=masks[:, :g] if with_masks else None,
            active_class_ids=active,
        )

    def _load_batch_python(self, image_ids, config: DetectorConfig, with_masks: bool = True):
        from objectdetection_tpu.detector import TrainBatch

        b = len(image_ids)
        h, w = config.image_shape[:2]
        g = config.max_gt_objects
        images = np.zeros((b, h, w, 3), np.float32)
        gt_boxes = np.zeros((b, g, 4), np.float32)
        gt_class_ids = np.zeros((b, g), np.int32)
        gt_masks = np.zeros((b, g, h, w), np.float32) if with_masks else None
        active = np.zeros((b, config.num_classes), np.int32)
        active[:, : self.num_classes] = 1

        mean = np.asarray(config.mean_pixel, np.float32)
        for bi, img_id in enumerate(image_ids):
            img = self.image(img_id).astype(np.float32)
            assert img.shape[:2] == (h, w), "shapes dataset images are pre-sized"
            images[bi] = img - mean
            masks, class_ids = self.masks(img_id)
            boxes = self.bboxes_from_masks(masks)
            # drop fully-occluded instances
            keep = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]) > 0
            boxes, class_ids, masks = boxes[keep], class_ids[keep], masks[:, :, keep]
            n = min(len(class_ids), g)
            scale = np.array([h - 1, w - 1, h - 1, w - 1], np.float32)
            shift = np.array([0, 0, 1, 1], np.float32)
            gt_boxes[bi, :n] = (boxes[:n].astype(np.float32) - shift) / scale
            gt_class_ids[bi, :n] = class_ids[:n]
            if with_masks:
                gt_masks[bi, :n] = np.transpose(masks[:, :, :n], (2, 0, 1))

        return TrainBatch(
            images=images,
            gt_boxes=gt_boxes,
            gt_class_ids=gt_class_ids,
            gt_masks=gt_masks,
            active_class_ids=active,
        )
