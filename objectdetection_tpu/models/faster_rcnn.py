"""Faster R-CNN (VGG16 + ZF anchors): the reference's secondary pipeline.

≙ `FasterRCNN/building_blocks/{rpn,proposals,fastrcnn}.py` rebuilt TPU-first:
the reference computes proposals in **host numpy behind a tf.py_func**
(main.py:20, SURVEY.md §3.4 calls this the clearest anti-pattern to
eliminate); here anchors/decode/clip/filter/NMS are one jitted program
sharing the framework's geometry and NMS kernels.

Coordinate conventions preserved from the reference Faster R-CNN path (which
differ from the Mask R-CNN path): boxes are pixel ``(x1, y1, x2, y2)``,
widths use the legacy ``+1`` convention (proposals.py:216-233), and ROI-pool
normalizes by image size (not size-1, fastrcnn.py:61-64).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from objectdetection_tpu.config import FasterRCNNConfig
from objectdetection_tpu.models.vgg16 import VGG16
from objectdetection_tpu.ops.nms import non_max_suppression
from objectdetection_tpu.ops.roi_align import crop_and_resize

# Shaoqing's ZF-net anchors, (x1, y1, x2, y2). ≙ proposals.py:180-196.
ZF_ANCHORS = np.array(
    [
        [-84.0, -40.0, 99.0, 55.0],
        [-176.0, -88.0, 191.0, 103.0],
        [-360.0, -184.0, 375.0, 199.0],
        [-56.0, -56.0, 71.0, 71.0],
        [-120.0, -120.0, 135.0, 135.0],
        [-248.0, -248.0, 263.0, 263.0],
        [-36.0, -80.0, 51.0, 95.0],
        [-80.0, -168.0, 95.0, 183.0],
        [-168.0, -344.0, 183.0, 359.0],
    ],
    np.float32,
)


def zf_grid_anchors(feature_shape: Tuple[int, int], stride: int) -> np.ndarray:
    """All shifted ZF anchors [H·W·9, 4] in (x1, y1, x2, y2) pixel coords.

    ≙ proposals.py:484-495: shift grid ordering is (y, x) row-major with the
    9 anchor shapes innermost.
    """
    h, w = feature_shape
    shift_x = np.arange(w) * stride
    shift_y = np.arange(h) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    anchors = ZF_ANCHORS[None, :, :] + shifts[:, None, :]
    return anchors.reshape(-1, 4).astype(np.float32)


def encode_zf_deltas(boxes: Array, gt_boxes: Array) -> Array:
    """Inverse of :func:`decode_zf_deltas` (legacy +1 size convention).

    ≙ corner_pixels_to_center (proposals.py:198-236). boxes/gt [..., 4] xyxy.
    """
    bw = boxes[..., 2] - boxes[..., 0] + 1.0
    bh = boxes[..., 3] - boxes[..., 1] + 1.0
    bcx = boxes[..., 0] + bw / 2.0
    bcy = boxes[..., 1] + bh / 2.0

    gw = gt_boxes[..., 2] - gt_boxes[..., 0] + 1.0
    gh = gt_boxes[..., 3] - gt_boxes[..., 1] + 1.0
    gcx = gt_boxes[..., 0] + gw / 2.0
    gcy = gt_boxes[..., 1] + gh / 2.0

    return jnp.stack(
        [
            (gcx - bcx) / bw,
            (gcy - bcy) / bh,
            jnp.log(gw / bw),
            jnp.log(gh / bh),
        ],
        axis=-1,
    )


def decode_zf_deltas(anchors: Array, deltas: Array) -> Array:
    """Inverse box transform with the legacy +1 size convention.

    ≙ corner_pixels_to_center_inv (proposals.py:239-311). anchors/deltas
    [..., 4] in (x1, y1, x2, y2) / (dx, dy, dw, dh).
    """
    aw = anchors[..., 2] - anchors[..., 0] + 1.0
    ah = anchors[..., 3] - anchors[..., 1] + 1.0
    acx = anchors[..., 0] + aw / 2.0
    acy = anchors[..., 1] + ah / 2.0

    cx = deltas[..., 0] * aw + acx
    cy = deltas[..., 1] * ah + acy
    pw = jnp.exp(deltas[..., 2]) * aw
    ph = jnp.exp(deltas[..., 3]) * ah
    return jnp.stack(
        [cx - pw / 2.0, cy - ph / 2.0, cx + pw / 2.0, cy + ph / 2.0], axis=-1
    )


class FasterRCNNRPN(nn.Module):
    """Single-level RPN head. ≙ FasterRCNN/building_blocks/rpn.py:9-97.

    Returns per-anchor foreground probs [B, H, W, 9] and deltas [B, H, W, 9, 4].
    (The reference reshapes 18 interleaved channels and then slices the first
    9 as "foreground" — proposals.py:477 — which mixes fg/bg channels; this
    implementation keeps the per-anchor softmax it clearly intended.)
    """

    anchors_per_location: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_map: Array):
        k = self.anchors_per_location
        x = nn.Conv(
            512, (3, 3), padding="SAME", name="rpn_conv",
            dtype=self.dtype, param_dtype=jnp.float32,
        )(feature_map)
        x = nn.relu(x)
        scores = nn.Conv(
            2 * k, (1, 1), name="rpn_class", dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x)
        b, h, w, _ = scores.shape
        logits = scores.reshape(b, h, w, k, 2)
        probs = jax.nn.softmax(logits, axis=-1)
        deltas = nn.Conv(
            4 * k, (1, 1), name="rpn_bbox", dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x).reshape(b, h, w, k, 4)
        return logits, probs[..., 1], deltas


def zf_proposal_layer(
    fg_probs: Array,
    deltas: Array,
    config: FasterRCNNConfig,
    training: bool = False,
) -> Tuple[Array, Array]:
    """Anchors → decoded, clipped, size-filtered, NMS'd proposals.

    ≙ Proposals.build + FilterBoxes (proposals.py:315-512), fixed-shape:
    returns (proposals [B, P, 4] pixel xyxy zero-padded, valid [B, P]).
    """
    b, h, w, k = fg_probs.shape
    anchors = jnp.asarray(zf_grid_anchors((h, w), config.backbone_stride))
    pre_nms = config.pre_nms_top_n_train if training else config.pre_nms_top_n_test
    post_nms = config.post_nms_top_n_train if training else config.post_nms_top_n_test
    pre_nms = min(pre_nms, anchors.shape[0])
    ih, iw = config.image_shape[:2]

    def per_image(scores_i, deltas_i):
        scores_flat = scores_i.reshape(-1)
        deltas_flat = deltas_i.reshape(-1, 4)
        boxes = decode_zf_deltas(anchors, deltas_flat)
        # clip to image (proposals.py:334-338)
        boxes = jnp.stack(
            [
                jnp.clip(boxes[:, 0], 0, iw - 1),
                jnp.clip(boxes[:, 1], 0, ih - 1),
                jnp.clip(boxes[:, 2], 0, iw - 1),
                jnp.clip(boxes[:, 3], 0, ih - 1),
            ],
            axis=1,
        )
        # min-size filter (proposals.py:341-348), as a validity mask
        keep = (
            (boxes[:, 2] - boxes[:, 0] + 1 >= config.min_box_size)
            & (boxes[:, 3] - boxes[:, 1] + 1 >= config.min_box_size)
        )
        masked_scores = jnp.where(keep, scores_flat, -jnp.inf)
        top_scores, ix = jax.lax.top_k(masked_scores, pre_nms)
        top_boxes = jnp.take(boxes, ix, axis=0)
        # the reference NMS measures +1 pixel areas (proposals.py:151-162:
        # area = (x2-x1+1)*(y2-y1+1)); shifting max corners by +1 maps that
        # onto the continuous-coordinate IoU kernel exactly
        res = non_max_suppression(
            top_boxes + jnp.array([0.0, 0.0, 1.0, 1.0], top_boxes.dtype),
            top_scores,
            post_nms,
            config.nms_threshold,
            valid=jnp.isfinite(top_scores),
        )
        out = jnp.take(top_boxes, jnp.maximum(res.indices, 0), axis=0)
        return jnp.where(res.valid[:, None], out, 0.0), res.valid

    return jax.vmap(per_image)(fg_probs, deltas)


class FastRCNNHead(nn.Module):
    """ROI pool + two FC layers + class/box outputs.

    ≙ fastrcnn.py:22-157: crop_and_resize 14² → 2×2 max pool → 7² → flatten →
    FC(1024)+relu+dropout ×2 → softmax(num_classes) + 4·num_classes.
    (The reference also relu's the logits — fc_layers at fastrcnn.py:154-157
    applies relu everywhere — a bug; logits here are linear.)
    """

    num_classes: int
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, feature_map: Array, rois: Array, image_shape, deterministic=True
    ):
        """feature_map [H, W, C] (one image), rois [R, 4] pixel xyxy."""
        ih, iw = image_shape[:2]
        # xyxy pixel → yxyx normalized by image size (fastrcnn.py:58-64)
        boxes = jnp.stack(
            [
                rois[:, 1] / ih,
                rois[:, 0] / iw,
                rois[:, 3] / ih,
                rois[:, 2] / iw,
            ],
            axis=1,
        )
        crops = crop_and_resize(feature_map.astype(self.dtype), boxes, (14, 14))
        pooled = nn.max_pool(crops, (2, 2), strides=(2, 2), padding="SAME")
        x = pooled.reshape(pooled.shape[0], -1)

        x = nn.relu(nn.Dense(1024, name="fc1", dtype=self.dtype)(x))
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = nn.relu(nn.Dense(1024, name="fc2", dtype=self.dtype)(x))
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)

        logits = nn.Dense(self.num_classes, name="fc_class", dtype=jnp.float32)(x)
        probs = jax.nn.softmax(logits, axis=-1)
        bbox = nn.Dense(4 * self.num_classes, name="fc_bbox", dtype=jnp.float32)(x)
        return logits, probs, bbox.reshape(-1, self.num_classes, 4)


class FasterRCNN(nn.Module):
    """Full Faster R-CNN: VGG16 → RPN → proposals → Fast R-CNN head.

    The reference never wired this together (`main.py` fully commented out,
    SURVEY.md §2.2); this is the working end-to-end version.
    """

    config: FasterRCNNConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = VGG16(dtype=self.dtype, name="vgg16")
        self.rpn = FasterRCNNRPN(dtype=self.dtype, name="rpn")
        self.head = FastRCNNHead(
            num_classes=self.config.num_classes, dtype=self.dtype, name="fastrcnn"
        )

    def features_and_rpn(self, images: Array):
        feats = self.backbone(images)
        rpn_logits, fg_probs, deltas = self.rpn(feats)
        return feats, rpn_logits, fg_probs, deltas

    def classify(self, feats: Array, rois: Array, deterministic: bool = True):
        """ROI heads on explicit boxes (training path samples these).

        Pass `deterministic=False` (with a 'dropout' rng in apply) to enable
        the head's dropout during training.
        """
        return jax.vmap(
            lambda fm, r: self.head(
                fm, r, self.config.image_shape, deterministic=deterministic
            )
        )(feats, rois)

    def __call__(self, images: Array, training: bool = False):
        feats = self.backbone(images)
        rpn_logits, fg_probs, deltas = self.rpn(feats)
        proposals, valid = zf_proposal_layer(
            fg_probs, deltas, self.config, training=training
        )
        if training:
            # proposals feed target sampling / ROI pooling only (the
            # reference stops gradients at ROI boxes); also keeps the NMS
            # kernel out of the backward program
            proposals = jax.lax.stop_gradient(proposals)
            valid = jax.lax.stop_gradient(valid)
        logits, probs, bbox = jax.vmap(
            lambda fm, rois: self.head(fm, rois, self.config.image_shape)
        )(feats, proposals)
        return {
            "feature_map": feats,
            "rpn_logits": rpn_logits,
            "fg_probs": fg_probs,
            "rpn_deltas": deltas,
            "proposals": proposals,
            "proposals_valid": valid,
            "class_logits": logits,
            "class_probs": probs,
            "bbox": bbox,
        }


class FasterRCNNDetections(NamedTuple):
    boxes: Array  # [B, N, 4] pixel xyxy
    class_ids: Array
    scores: Array
    valid: Array


def faster_rcnn_detections(
    outputs,
    config: FasterRCNNConfig,
    score_threshold: float = 0.5,
    nms_threshold: float = 0.3,
    max_detections: int = 50,
) -> FasterRCNNDetections:
    """Final per-class NMS postprocess (an extension — the reference stops at
    head outputs; its driver was never finished)."""
    proposals = outputs["proposals"]
    probs = outputs["class_probs"]
    bbox = outputs["bbox"]
    ih, iw = config.image_shape[:2]

    def per_image(props, p, d, pvalid):
        cls = jnp.argmax(p, axis=-1)
        score = jnp.take_along_axis(p, cls[:, None], axis=1)[:, 0]
        delta = jnp.take_along_axis(
            d, cls[:, None, None].repeat(4, -1), axis=1
        )[:, 0]
        boxes = decode_zf_deltas(props, delta)
        boxes = jnp.stack(
            [
                jnp.clip(boxes[:, 0], 0, iw - 1),
                jnp.clip(boxes[:, 1], 0, ih - 1),
                jnp.clip(boxes[:, 2], 0, iw - 1),
                jnp.clip(boxes[:, 3], 0, ih - 1),
            ],
            axis=1,
        )
        valid = pvalid & (cls > 0) & (score > score_threshold)
        res = non_max_suppression(
            boxes, score, max_detections, nms_threshold,
            valid=valid, class_ids=cls,
        )
        idx = jnp.maximum(res.indices, 0)
        return (
            jnp.where(res.valid[:, None], jnp.take(boxes, idx, axis=0), 0.0),
            jnp.where(res.valid, jnp.take(cls, idx), 0),
            jnp.where(res.valid, jnp.take(score, idx), 0.0),
            res.valid,
        )

    b, c, s, v = jax.vmap(per_image)(
        proposals, probs, bbox, outputs["proposals_valid"]
    )
    return FasterRCNNDetections(boxes=b, class_ids=c, scores=s, valid=v)
