"""The Mask R-CNN network module: backbone + RPN + ROI heads in one Flax tree.

This replaces the reference's stage-wise graph construction with pickle
handoffs (`inference.py:36-254`, SURVEY.md §3.1-3.2) — here the whole network
is one parameter tree and every stage runs inside a single jitted program.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from objectdetection_tpu.config import DetectorConfig
from objectdetection_tpu.models.backbone import ResNetFPN
from objectdetection_tpu.models.heads import BoxClassHead, MaskHead
from objectdetection_tpu.models.rpn import RPNHead
from objectdetection_tpu.ops.roi_align import batched_multilevel_roi_align
from objectdetection_tpu.ops.roi_align_pallas import (
    batched_multilevel_roi_align_pallas,
    pallas_roi_align_supported,
)


class MaskRCNN(nn.Module):
    """Parameter container + forward methods for the full detector."""

    config: DetectorConfig

    def setup(self):
        cfg = self.config
        dt = jnp.dtype(cfg.compute_dtype)
        self.backbone = ResNetFPN(
            model=cfg.backbone, channels=cfg.fpn_channels, dtype=dt,
            conv1_space_to_depth=cfg.conv1_space_to_depth,
            remat=cfg.remat_backbone, quantized=cfg.quantized_inference,
            s2d_stage2=cfg.s2d_stage2,
            fused_bottleneck=cfg.fused_bottleneck,
            per_channel=cfg.per_channel_acts,
            quantize_p2=cfg.quantize_fpn_p2, name="fpn",
        )
        self.rpn = RPNHead(
            anchors_per_location=cfg.num_anchors_per_location,
            anchor_stride=cfg.rpn_anchor_stride,
            dtype=dt,
            quantized=cfg.quantized_inference and cfg.quantize_rpn,
            per_channel=cfg.per_channel_acts,
            name="rpn_model",
        )
        self.box_head = BoxClassHead(
            num_classes=cfg.num_classes, dtype=dt,
            quantized=cfg.quantized_inference and cfg.quantize_box_head,
            per_channel=cfg.per_channel_acts,
            name="mrcnn",
        )
        self.mask_head = MaskHead(
            num_classes=cfg.num_classes, dtype=dt,
            quantized=cfg.quantized_inference and cfg.quantize_mask_head,
            per_channel=cfg.per_channel_acts,
            name="mrcnn_mask",
        )

    def extract(self, images: Array):
        """images [B, H, W, 3] → (pyramid P2..P6, rpn logits/probs/deltas)."""
        if self.config.input_scale != 1.0:
            images = images * self.config.input_scale
        feats = self.backbone(images)
        logits, probs, deltas = self.rpn(feats)
        return feats, logits, probs, deltas

    def _roi_align(self, feats, rois, crop_size, use_pallas: bool, stage: str):
        """Pooling dispatch: Pallas patch-DMA kernel on the inference path
        (TPU, big-enough pyramids, stage enabled in cfg.pallas_roi_align),
        XLA gather otherwise (training — the Pallas call has no JVP — CPU,
        and small images)."""
        cfg = self.config
        feats = list(feats[:4])
        stage_on = cfg.pallas_roi_align == "all" or cfg.pallas_roi_align == stage
        if (
            use_pallas
            and stage_on
            and jax.default_backend() == "tpu"
            and pallas_roi_align_supported(feats)
        ):
            align = batched_multilevel_roi_align_pallas
        else:
            align = batched_multilevel_roi_align
        return align(
            feats, rois, tuple(cfg.image_shape[:2]), tuple(crop_size)
        )

    def classify_rois(
        self, feats: Sequence[Array], rois: Array, use_pallas: bool = False
    ):
        """ROIAlign + box/class head: rois [B, R, 4] → (logits, probs, bbox)."""
        cfg = self.config
        pooled = self._roi_align(
            feats, rois, cfg.pool_shape, use_pallas, "boxes"
        )
        return self.box_head(pooled.astype(jnp.dtype(cfg.compute_dtype)))

    def predict_masks(
        self,
        feats: Sequence[Array],
        rois: Array,
        class_ids: Array | None = None,
        use_pallas: bool = False,
    ) -> Array:
        """ROIAlign 14² + mask head: rois [B, R, 4] → [B, R, 28, 28, C].

        With `class_ids` [B, R], computes only each ROI's selected-class
        mask and returns [B, R, 28, 28] (inference fast path).
        """
        cfg = self.config
        pooled = self._roi_align(
            feats, rois, cfg.mask_pool_shape, use_pallas, "masks"
        )
        return self.mask_head(
            pooled.astype(jnp.dtype(cfg.compute_dtype)), class_ids
        )

    def __call__(self, images: Array):
        """Init-friendly pass touching every submodule."""
        feats, logits, probs, deltas = self.extract(images)
        b = images.shape[0]
        rois = jnp.tile(
            jnp.array([[[0.1, 0.1, 0.6, 0.6]]], jnp.float32), (b, 1, 1)
        )
        cls_logits, cls_probs, bbox = self.classify_rois(feats, rois)
        masks = self.mask_head(
            jnp.zeros(
                (b, 1, *self.config.mask_pool_shape, self.config.fpn_channels),
                jnp.float32,
            )
        )
        return logits, probs, deltas, cls_logits, bbox, masks
