"""Data pipeline: on-device image molding, synthetic shapes dataset, COCO reader."""

from objectdetection_tpu.data.preprocess import (  # noqa: F401
    ImageMeta,
    mold_image_device,
    mold_image_host,
    unmold_detections,
)
