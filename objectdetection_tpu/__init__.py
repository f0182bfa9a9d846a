"""objectdetection_tpu — a TPU-native object-detection framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Sardhendu/ObjectDetection (TF1-era Faster R-CNN / Mask R-CNN):

- ``config``     frozen dataclass configs (≙ reference MaskRCNN/config.py)
- ``geometry``   pure-jnp box math: IoU, delta encode/decode, norm/denorm, clip
- ``anchors``    FPN pyramid anchor generation as a jit-time constant
- ``ops``        detection kernels: fixed-size masked NMS, multilevel ROIAlign,
                 anchor matching — XLA reference impls + Pallas TPU kernels
- ``models``     pure-functional Flax modules: ResNet+FPN, RPN, heads, VGG16
- ``layers``     proposal / detection / target layers (vmapped, mask-based,
                 no per-image Python loops)
- ``losses``     RPN + RCNN + mask losses
- ``data``       synthetic shapes dataset, on-device preprocessing (mold/unmold)
- ``checkpoint`` orbax checkpointing + matterport-h5 converter
- ``parallel``   device mesh + shard_map data parallelism
"""

__version__ = "0.1.0"

from objectdetection_tpu import config  # noqa: F401
from objectdetection_tpu.config import (  # noqa: F401
    COCO_CONFIG,
    SHAPES_CONFIG,
    DetectorConfig,
    FasterRCNNConfig,
)


def __getattr__(name):
    """Lazy submodule access: `objectdetection_tpu.detector` etc. without
    importing the heavy dependency graph at package import."""
    import importlib

    if name in {
        "detector", "parallel", "checkpoint", "losses", "geometry",
        "anchors", "evaluate", "metrics", "viz", "serve", "coco_eval",
    }:
        return importlib.import_module(f"objectdetection_tpu.{name}")
    raise AttributeError(name)
