"""Detection compute kernels.

These are the ops the reference delegated to the TF C++ runtime
(`tf.image.non_max_suppression`, `tf.image.crop_and_resize`, host-numpy IoU
matching — see SURVEY.md §2.4). Here each is a TPU-native implementation:
static shapes, validity masks, tiled vector math — with XLA reference
implementations and Pallas fast paths behind the same signatures.
"""

from objectdetection_tpu.ops.nms import (  # noqa: F401
    nms_boxes,
    non_max_suppression,
    set_nms_backend,
)
from objectdetection_tpu.ops.roi_align import (  # noqa: F401
    batched_multilevel_roi_align,
    crop_and_resize,
    multilevel_roi_align,
)
