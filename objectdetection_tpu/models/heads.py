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
    per_channel: bool = False  # per-channel act quant (config.per_channel_acts)

    @nn.compact
    def __call__(
        self, pooled: Array, in_scale: Array | None = None
    ) -> Tuple[Array, Array, Array]:
        """pooled: [B, R, ph, pw, C] → ([B,R,num_classes] ×2, [B,R,num_classes,4]).

        `in_scale`: activation scale(s) of an already-int8 `pooled` (the
        int8-pooled stream from the Pallas align kernel; quantized path
        only) — forwarded to the first dense layer.
        """
        b, r, ph, pw, c = pooled.shape
        dt = self.dtype
        make_dense = dense_factory(self.quantized, dt)
        x = pooled.reshape(b, r, ph * pw * c)
        if pooled.dtype != jnp.int8:
            x = x.astype(dt)

        # 7x7 VALID conv == dense over the flattened ROI (mrcnn_class_conv1)
        conv1 = make_dense(
            1024, name="mrcnn_class_conv1", per_channel=self.per_channel
        )
        x = conv1(x, in_scale) if in_scale is not None else conv1(x)
        x = nn.relu(FrozenBatchNorm(name="mrcnn_class_bn1", dtype=dt)(x))
        # 1x1 conv == dense (mrcnn_class_conv2)
        x = make_dense(
            1024, name="mrcnn_class_conv2", per_channel=self.per_channel
        )(x)
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


class _MaskFinalConv(nn.Module):
    """The mask head's final per-class 1×1 conv, with a class-selected path.

    Param tree ("kernel" [1, 1, C, num_classes], "bias" [num_classes])
    matches ``nn.Conv`` so checkpoints are interchangeable. With
    `class_ids`, only the selected class's 256→1 column is applied per ROI —
    the full-class output at inference is immediately reduced by
    `take_along_axis` in the detector, so computing (and materializing,
    ~813 MB f32 at batch 32) all 81 channels is pure waste.
    """

    num_classes: int

    @nn.compact
    def __call__(self, x: Array, class_ids: Array | None = None) -> Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, cin, self.num_classes),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.num_classes,), jnp.float32
        )
        x = x.astype(jnp.float32)
        if class_ids is None:
            return jnp.einsum("nhwc,co->nhwo", x, kernel[0, 0]) + bias
        # per-ROI column select: [N, C] weights, [N] bias
        kc = jnp.take(kernel[0, 0].T, class_ids, axis=0)
        bc = jnp.take(bias, class_ids, axis=0)
        return (
            jnp.einsum("nhwc,nc->nhw", x, kc) + bc[:, None, None]
        )


class MaskHead(nn.Module):
    """Pooled ROIs (14²) → per-class sigmoid masks [B, R, 28, 28, num_classes].

    Implements the reference's commented spec (masking.py:34-68):
    4× [conv3×3(256)+BN+relu] → deconv2×2 stride 2 (relu) → 1×1 conv sigmoid.

    With `class_ids` [B, R] only the selected class's mask is computed,
    returning [B, R, 28, 28] (inference fast path).
    """

    num_classes: int
    channels: int = 256
    dtype: Any = jnp.float32
    quantized: bool = False  # int8 path for the 4 trunk convs
    per_channel: bool = False  # per-channel act quant (config.per_channel_acts)

    @nn.compact
    def __call__(
        self,
        pooled: Array,
        class_ids: Array | None = None,
        in_scale: Array | None = None,
    ) -> Array:
        b, r, ph, pw, c = pooled.shape
        dt = self.dtype
        make_conv = conv_factory(self.quantized, dt)
        x = pooled.reshape(b * r, ph, pw, c)
        if pooled.dtype != jnp.int8:
            x = x.astype(dt)

        for i in range(1, 5):
            conv = make_conv(
                self.channels, (3, 3), padding="SAME",
                name=f"mrcnn_mask_conv{i}", per_channel=self.per_channel,
            )
            # int8-pooled stream from the Pallas align kernel enters conv1
            x = (
                conv(x, in_scale)
                if (i == 1 and in_scale is not None)
                else conv(x)
            )
            x = nn.relu(FrozenBatchNorm(name=f"mrcnn_mask_bn{i}", dtype=dt)(x))

        x = nn.ConvTranspose(
            self.channels, (2, 2), strides=(2, 2),
            name="mrcnn_mask_deconv", dtype=dt, param_dtype=jnp.float32,
        )(x)
        x = nn.relu(x)
        final = _MaskFinalConv(num_classes=self.num_classes, name="mrcnn_mask")
        if class_ids is not None:
            logits = final(x, class_ids.reshape(b * r))
            return nn.sigmoid(logits).reshape(b, r, 2 * ph, 2 * pw)
        masks = nn.sigmoid(final(x))
        return masks.reshape(b, r, 2 * ph, 2 * pw, self.num_classes)
