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
            quantize_p2=cfg.quantize_fpn_p2,
            dot_lowering=cfg.int8_dot_lowering,
            int8_stem=cfg.int8_stem,
            bf16_stages=cfg.bf16_stages, name="fpn",
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
        if cfg.quantized_inference:
            # pooled-ROI activation scales: recorded during calibration and
            # handed to the Pallas align kernel so it can emit int8 pooled
            # tensors directly (cfg.int8_pooled), skipping a separate
            # multi-GB quantize pass XLA cannot fuse into the opaque
            # pallas_call. Per flattened position for the dense box head
            # ([ph*pw*C] with per-channel acts), per channel for the mask
            # trunk conv ([C]) — the SAME statistic those heads' own
            # act_scale records, so both quantizations agree exactly.
            ph, pw = cfg.pool_shape
            c = cfg.fpn_channels
            box_shape = (ph * pw * c,) if cfg.per_channel_acts else ()
            mask_shape = (c,) if cfg.per_channel_acts else ()
            self.pooled_box_scale = self.variable(
                "quant", "pooled_box_scale",
                lambda: jnp.zeros(box_shape, jnp.float32),
            )
            self.pooled_mask_scale = self.variable(
                "quant", "pooled_mask_scale",
                lambda: jnp.zeros(mask_shape, jnp.float32),
            )

    def extract(self, images: Array, return_qfeats: bool = False):
        """images [B, H, W, 3] → (pyramid P2..P6, rpn logits/probs/deltas).

        `return_qfeats` appends ``(int8 P2..P5 list, scale) | None``: the
        quantized copies of the pyramid the RPN's shared conv computes
        anyway on the int8 serving path (config.int8_align_inputs — the
        ROIAlign kernel reads them at half the bf16 patch-DMA bytes).
        """
        if self.config.input_scale != 1.0:
            images = images * self.config.input_scale
        feats = self.backbone(images)
        if return_qfeats:
            logits, probs, deltas, q = self.rpn(
                feats, return_quantized_inputs=True
            )
            if q is not None:
                q = (q[0][:4], q[1])  # align reads P2..P5 only
            return feats, logits, probs, deltas, q
        logits, probs, deltas = self.rpn(feats)
        return feats, logits, probs, deltas

    def _roi_align(
        self, feats, rois, crop_size, use_pallas: bool, stage: str,
        out_quant=None, qfeats=None,
    ):
        """Pooling dispatch: Pallas patch-DMA kernel on the inference path
        (TPU, big-enough pyramids, stage enabled in cfg.pallas_roi_align),
        XLA gather otherwise (training — the Pallas call has no JVP — CPU,
        and small images). `out_quant` (a [ph, pw, C] scale map) makes the
        Pallas kernel emit int8 pooled tensors directly; the XLA path
        ignores it (its consumers quantize internally as before).
        `qfeats` = (int8 P2..P5, scale): when given (and the gate
        cfg.int8_align_inputs is on) the Pallas kernel reads the int8
        pyramid instead — half the patch-DMA bytes; the XLA fallback keeps
        the float feats."""
        cfg = self.config
        feats = list(feats[:4])
        stage_on = cfg.pallas_roi_align == "all" or cfg.pallas_roi_align == stage
        if (
            use_pallas
            and stage_on
            and jax.default_backend() == "tpu"
            and pallas_roi_align_supported(feats)
        ):
            in_scale = None
            if qfeats is not None and cfg.int8_align_inputs:
                feats, in_scale = list(qfeats[0][:4]), qfeats[1]
            return batched_multilevel_roi_align_pallas(
                feats, rois, tuple(cfg.image_shape[:2]), tuple(crop_size),
                out_quant=out_quant, in_scale=in_scale,
                step_rois=cfg.align_step_rois or None,
                skip_chunks=cfg.align_skip_chunks,
            )
        return batched_multilevel_roi_align(
            feats, rois, tuple(cfg.image_shape[:2]), tuple(crop_size)
        )

    def classify_rois(
        self, feats: Sequence[Array], rois: Array, use_pallas: bool = False,
        qfeats=None,
    ):
        """ROIAlign + box/class head: rois [B, R, 4] → (logits, probs, bbox)."""
        cfg = self.config
        ph, pw = cfg.pool_shape
        c = cfg.fpn_channels
        calibrating = self.is_mutable_collection("quant")
        int8p = (
            cfg.quantized_inference
            and cfg.quantize_box_head
            and cfg.int8_pooled
            and not calibrating
        )
        out_quant = None
        if int8p:
            s = self.pooled_box_scale.value
            if s.ndim == 0:
                s = jnp.full((ph * pw * c,), s)
            out_quant = s.reshape(ph, pw, c)
        pooled = self._roi_align(
            feats, rois, cfg.pool_shape, use_pallas, "boxes",
            out_quant=out_quant, qfeats=qfeats,
        )
        if cfg.quantized_inference and calibrating:
            # record the pooled-ROI absmax — the identical statistic the
            # box head's first dense layer records as its act_scale, so
            # the in-kernel quantization and the head's agree exactly
            a = jnp.abs(pooled.astype(jnp.float32)).reshape(-1, ph * pw * c)
            upd = (
                jnp.max(a, axis=0)
                if cfg.per_channel_acts
                else jnp.max(a)
            )
            self.pooled_box_scale.value = jnp.maximum(
                self.pooled_box_scale.value, upd
            )
        if pooled.dtype == jnp.int8:
            return self.box_head(
                pooled, in_scale=self.pooled_box_scale.value
            )
        return self.box_head(pooled.astype(jnp.dtype(cfg.compute_dtype)))

    def predict_masks(
        self,
        feats: Sequence[Array],
        rois: Array,
        class_ids: Array | None = None,
        use_pallas: bool = False,
        qfeats=None,
    ) -> Array:
        """ROIAlign 14² + mask head: rois [B, R, 4] → [B, R, 28, 28, C].

        With `class_ids` [B, R], computes only each ROI's selected-class
        mask and returns [B, R, 28, 28] (inference fast path).
        """
        cfg = self.config
        mh, mw = cfg.mask_pool_shape
        c = cfg.fpn_channels
        calibrating = self.is_mutable_collection("quant")
        int8p = (
            cfg.quantized_inference
            and cfg.quantize_mask_head
            and cfg.int8_pooled
            and not calibrating
        )
        out_quant = None
        if int8p:
            s = self.pooled_mask_scale.value  # [C] or scalar
            out_quant = jnp.broadcast_to(
                s.reshape(1, 1, -1) if s.ndim else s, (mh, mw, c)
            )
        pooled = self._roi_align(
            feats, rois, cfg.mask_pool_shape, use_pallas, "masks",
            out_quant=out_quant, qfeats=qfeats,
        )
        if cfg.quantized_inference and calibrating:
            # same statistic as the mask trunk conv1's act_scale (per input
            # channel with per-channel acts, one scalar otherwise)
            a = jnp.abs(pooled.astype(jnp.float32))
            upd = (
                jnp.max(a, axis=(0, 1, 2, 3))
                if cfg.per_channel_acts
                else jnp.max(a)
            )
            self.pooled_mask_scale.value = jnp.maximum(
                self.pooled_mask_scale.value, upd
            )
        if pooled.dtype == jnp.int8:
            return self.mask_head(
                pooled, class_ids, in_scale=self.pooled_mask_scale.value
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
