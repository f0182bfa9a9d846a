"""ROI heads: box/class classifier and mask predictor.

≙ the reference classifier graph (`maskrcnn.py:242-294`) and the mask-head
spec (`masking.py:34-68` — commented out in the reference; implemented for
real here).

TPU-native detail: the reference's TimeDistributed 7×7 VALID conv over
[B, R, 7, 7, C] pooled ROIs is algebraically a dense layer over the flattened
ROI — implemented here as one big [B·R, 7·7·C] × [7·7·C, 1024] matmul, which
is exactly the MXU-shaped formulation (no per-ROI conv dispatch).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from objectdetection_tpu.models.backbone import FrozenBatchNorm
from objectdetection_tpu.quant import conv_factory, dense_factory


class BoxClassHead(nn.Module):
    """Pooled ROIs → (class logits, class probs, per-class box deltas).

    ≙ maskrcnn.classifier_with_fpn_keras (maskrcnn.py:242-294):
    conv7×7(1024)+BN+relu → conv1×1(1024)+BN+relu → Dense(C) & Dense(4C).
    """

    num_classes: int
    dtype: Any = jnp.float32
    quantized: bool = False  # int8 matmuls for the two 1024-wide FC layers

    @nn.compact
    def __call__(self, pooled: Array) -> Tuple[Array, Array, Array]:
        """pooled: [B, R, ph, pw, C] → ([B,R,num_classes] ×2, [B,R,num_classes,4])."""
        b, r, ph, pw, c = pooled.shape
        dt = self.dtype
        make_dense = dense_factory(self.quantized, dt)
        x = pooled.reshape(b, r, ph * pw * c).astype(dt)

        # 7x7 VALID conv == dense over the flattened ROI (mrcnn_class_conv1)
        x = make_dense(1024, name="mrcnn_class_conv1")(x)
        x = nn.relu(FrozenBatchNorm(name="mrcnn_class_bn1", dtype=dt)(x))
        # 1x1 conv == dense (mrcnn_class_conv2)
        x = make_dense(1024, name="mrcnn_class_conv2")(x)
        shared = nn.relu(FrozenBatchNorm(name="mrcnn_class_bn2", dtype=dt)(x))

        logits = nn.Dense(
            self.num_classes, name="mrcnn_class_logits",
            dtype=jnp.float32, param_dtype=jnp.float32,
        )(shared)
        probs = nn.softmax(logits, axis=-1)

        bbox = nn.Dense(
            self.num_classes * 4, name="mrcnn_bbox_fc",
            dtype=jnp.float32, param_dtype=jnp.float32,
        )(shared)
        bbox = bbox.reshape(b, r, self.num_classes, 4)
        return logits, probs, bbox


class MaskHead(nn.Module):
    """Pooled ROIs (14²) → per-class sigmoid masks [B, R, 28, 28, num_classes].

    Implements the reference's commented spec (masking.py:34-68):
    4× [conv3×3(256)+BN+relu] → deconv2×2 stride 2 (relu) → 1×1 conv sigmoid.
    """

    num_classes: int
    channels: int = 256
    dtype: Any = jnp.float32
    quantized: bool = False  # int8 path for the 4 trunk convs

    @nn.compact
    def __call__(self, pooled: Array) -> Array:
        b, r, ph, pw, c = pooled.shape
        dt = self.dtype
        make_conv = conv_factory(self.quantized, dt)
        x = pooled.reshape(b * r, ph, pw, c).astype(dt)

        for i in range(1, 5):
            x = make_conv(
                self.channels, (3, 3), padding="SAME", name=f"mrcnn_mask_conv{i}"
            )(x)
            x = nn.relu(FrozenBatchNorm(name=f"mrcnn_mask_bn{i}", dtype=dt)(x))

        x = nn.ConvTranspose(
            self.channels, (2, 2), strides=(2, 2),
            name="mrcnn_mask_deconv", dtype=dt, param_dtype=jnp.float32,
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.num_classes, (1, 1), name="mrcnn_mask",
            dtype=jnp.float32, param_dtype=jnp.float32,
        )(x)
        masks = nn.sigmoid(x)
        return masks.reshape(b, r, 2 * ph, 2 * pw, self.num_classes)
