"""Batched COCO evaluation driver (BASELINE.json config 5).

Runs the full jitted inference pipeline over a COCO-style dataset with
data-parallel sharding across the device mesh, unmolds detections back to
original-image pixel coordinates on device, and accumulates COCO-style mAP.

This is the multi-device replacement for the reference's single-image
`inference.py` driver; on a multi-host setup each host feeds its own batch
shard (`jax.distributed` + the same `parallel.make_parallel_infer_fn`).
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_tpu import detector, parallel
from objectdetection_tpu.config import DetectorConfig
from objectdetection_tpu.data.coco import CocoDataset, eval_batch
from objectdetection_tpu.evaluate import DetectionEvaluator, coco_iou_thresholds


def run_coco_eval(
    dataset: CocoDataset,
    variables,
    config: DetectorConfig,
    batch_size: int = 8,
    max_images: Optional[int] = None,
    mesh=None,
    iou_thresholds: Optional[Sequence[float]] = None,
    verbose: bool = True,
):
    """Evaluate the detector on a COCO-style dataset.

    Returns (results dict from DetectionEvaluator, images_per_sec).
    """
    image_ids = dataset.image_ids[:max_images] if max_images else dataset.image_ids
    thresholds = list(iou_thresholds or coco_iou_thresholds())
    ev = DetectionEvaluator(config.num_classes, iou_thresholds=thresholds)

    if mesh is not None:
        infer = parallel.make_parallel_infer_fn(config, mesh, with_masks=False)
        sharding = parallel.batch_sharding(mesh)
        put = lambda x: jax.device_put(jnp.asarray(x), sharding)
    else:
        infer = detector.make_infer_fn(config, with_masks=False)
        put = jnp.asarray

    d = config.image_max_dim
    n_done = 0
    t_infer = 0.0
    for start in range(0, len(image_ids), batch_size):
        ids = image_ids[start : start + batch_size]
        pad = batch_size - len(ids)
        images, windows, shapes = eval_batch(dataset, ids, config)
        if pad:
            images = np.pad(images, ((0, pad), (0, 0), (0, 0), (0, 0)))
            windows = np.pad(windows, ((0, pad), (0, 0)), constant_values=1)
            shapes = np.pad(shapes, ((0, pad), (0, 0)), constant_values=1)

        t0 = time.time()
        det = infer(variables, put(images), put(windows))
        det_boxes_h = np.asarray(det.boxes)  # also syncs for timing
        t_infer += time.time() - t0

        det_cls_h = np.asarray(det.class_ids)
        det_scores_h = np.asarray(det.scores)
        for bi, img_id in enumerate(ids):
            # canonical window-relative unmold, host-side (one device→host
            # transfer per batch above; no per-image device dispatches)
            from objectdetection_tpu.data.preprocess import unmold_detections_np

            det_row = np.concatenate(
                [
                    det_boxes_h[bi],
                    det_cls_h[bi][:, None].astype(np.float32),
                    det_scores_h[bi][:, None],
                ],
                axis=1,
            )
            boxes_px, cls, scores_v, valid = unmold_detections_np(
                det_row, windows[bi], (d, d), shapes[bi]
            )
            gt_boxes, gt_classes = dataset.annotations(img_id)
            crowd_boxes, crowd_classes = dataset.crowd_regions(img_id)
            ev.add_image(
                np.asarray(boxes_px)[valid],
                np.asarray(cls)[valid],
                np.asarray(scores_v)[valid],
                gt_boxes,
                gt_classes,
                ignore_boxes=crowd_boxes,
                ignore_classes=crowd_classes,
            )
        n_done += len(ids)
        if verbose and (start // batch_size) % 10 == 0:
            print(f"  evaluated {n_done}/{len(image_ids)}", flush=True)

    results = ev.evaluate()
    imgs_per_sec = n_done / max(t_infer, 1e-9)
    if verbose:
        print(
            f"mAP={results['mAP']:.4f}"
            + (f" AP50={results['AP50']:.4f}" if "AP50" in results else "")
            + f"  ({imgs_per_sec:.1f} img/s inference)"
        )
    return results, imgs_per_sec
