"""Neural modules: pure-functional Flax definitions of the detector networks.

Architecturally these match the reference graphs (ResNet-50/101 + FPN
backbone, RPN head, box/class head, mask head, VGG16) but are implemented as
Flax modules compiled by XLA: NHWC layouts, fused conv+BN+relu, a configurable
bfloat16 compute dtype for the MXU, and no per-image or per-level Python loops
at runtime.
"""

from objectdetection_tpu.models.backbone import ResNetFPN  # noqa: F401
from objectdetection_tpu.models.rpn import RPNHead  # noqa: F401
from objectdetection_tpu.models.heads import BoxClassHead, MaskHead  # noqa: F401
