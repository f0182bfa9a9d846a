"""Image molding/unmolding (preprocessing and result back-projection).

≙ the reference's host-numpy path (`data_processor.py:15-108`,
`utils.resize_image` utils.py:78-120, `unmold_detection` detection.py:8-53),
but the hot path runs **on device inside jit**: aspect-preserving resize to a
static square canvas via `jax.image.scale_and_translate` (static output shape,
dynamic scale/translation — the TPU-native way to express "resize then pad"),
mean-pixel normalization, and window-relative detection unmolding, all with
fixed shapes.

Image metadata is a structured NamedTuple of arrays rather than the
reference's positional 13+-field float vector (`compose_image_meta`,
data_processor.py:15-37); `ImageMeta.to_vector` emits the reference layout for
compatibility.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from objectdetection_tpu.config import DetectorConfig
from objectdetection_tpu.geometry import norm_boxes


class ImageMeta(NamedTuple):
    """Per-image provenance threaded through the pipeline (batched arrays)."""

    image_id: Array  # [B] int32
    original_shape: Array  # [B, 3] int32 (H, W, C) before molding
    image_shape: Array  # [B, 3] int32 after molding
    window: Array  # [B, 4] float32 (y1, x1, y2, x2) pixels: real-image region
    scale: Array  # [B] float32
    active_class_ids: Array  # [B, num_classes] int32

    def to_vector(self) -> Array:
        """Reference-layout meta vector [B, 12 + num_classes]."""
        return jnp.concatenate(
            [
                self.image_id[:, None].astype(jnp.float32),
                self.original_shape.astype(jnp.float32),
                self.image_shape.astype(jnp.float32),
                self.window.astype(jnp.float32),
                self.scale[:, None],
                self.active_class_ids.astype(jnp.float32),
            ],
            axis=1,
        )


def compute_resize_params(
    orig_h, orig_w, min_dim: int, max_dim: int, min_scale: float = 0.0
):
    """Scale + centered padding for square-mode resize. ≙ utils.py:92-118.

    Works on Python ints or traced scalars; returns (scale, new_h, new_w,
    top_pad, left_pad).
    """
    orig_h = jnp.asarray(orig_h, jnp.float32)
    orig_w = jnp.asarray(orig_w, jnp.float32)
    scale = jnp.maximum(1.0, min_dim / jnp.minimum(orig_h, orig_w))
    if min_scale:
        scale = jnp.maximum(scale, min_scale)
    scale = jnp.minimum(scale, max_dim / jnp.maximum(orig_h, orig_w))
    new_h = jnp.round(orig_h * scale)
    new_w = jnp.round(orig_w * scale)
    top_pad = jnp.floor((max_dim - new_h) / 2)
    left_pad = jnp.floor((max_dim - new_w) / 2)
    return scale, new_h, new_w, top_pad, left_pad


def mold_image_device(
    image: Array,
    orig_shape: Array,
    config: DetectorConfig,
) -> Tuple[Array, Array, Array]:
    """On-device mold of one image already placed on a static canvas.

    Args:
      image: [Hc, Wc, 3] float/uint8 canvas with the real image in the
        top-left `orig_shape` corner (zero elsewhere). The canvas is any
        static shape ≥ the original image.
      orig_shape: [2] (h, w) of the real image content.
      config: detector config (target `image_max_dim` square output).

    Returns:
      (molded [D, D, 3] float32 mean-subtracted, window [4] float32 pixels,
       scale [] float32).
    """
    d = config.image_max_dim
    oh = orig_shape[0].astype(jnp.float32)
    ow = orig_shape[1].astype(jnp.float32)
    scale, new_h, new_w, top, left = compute_resize_params(
        oh, ow, config.image_min_dim, d, config.image_min_scale
    )

    resized = jax.image.scale_and_translate(
        image.astype(jnp.float32),
        shape=(d, d, 3),
        spatial_dims=(0, 1),
        scale=jnp.stack([scale, scale]),
        translation=jnp.stack([top, left]),
        method="linear",
    )
    # zero outside the window (scale_and_translate already zero-fills, but the
    # kernel can bleed a fraction of a pixel past the content edge)
    yy = jnp.arange(d, dtype=jnp.float32)[:, None]
    xx = jnp.arange(d, dtype=jnp.float32)[None, :]
    inside = (
        (yy >= top) & (yy < top + new_h) & (xx >= left) & (xx < left + new_w)
    )
    resized = jnp.where(inside[:, :, None], resized, 0.0)

    molded = resized - jnp.asarray(config.mean_pixel, jnp.float32)
    window = jnp.stack([top, left, top + new_h, left + new_w])
    return molded, window, scale


def mold_batch_device(
    images: Array,
    orig_shapes: Array,
    config: DetectorConfig,
    image_ids: Optional[Array] = None,
) -> Tuple[Array, ImageMeta]:
    """Vmapped on-device molding of a batch of canvas-placed images.

    Args:
      images: [B, Hc, Wc, 3] static canvases (real content top-left).
      orig_shapes: [B, 2] (h, w) per image.
      config: detector config.
      image_ids: optional [B] ids threaded into the meta.

    Returns (molded [B, D, D, 3], ImageMeta) — the meta carries the windows
    the detection layer and unmold step need.
    """
    b = images.shape[0]
    molded, windows, scales = jax.vmap(
        lambda im, sh: mold_image_device(im, sh, config)
    )(images, orig_shapes)
    d = config.image_max_dim
    meta = ImageMeta(
        image_id=(
            image_ids if image_ids is not None else jnp.arange(b)
        ).astype(jnp.int32),
        original_shape=jnp.concatenate(
            [orig_shapes.astype(jnp.int32), jnp.full((b, 1), 3, jnp.int32)],
            axis=1,
        ),
        image_shape=jnp.tile(jnp.asarray([[d, d, 3]], jnp.int32), (b, 1)),
        window=windows,
        scale=scales,
        active_class_ids=jnp.ones((b, config.num_classes), jnp.int32),
    )
    return molded, meta


def mold_image_host(
    image: np.ndarray, config: DetectorConfig
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Host (numpy/cv2) mold for variable-size source images.

    Mirrors `utils.resize_image` (utils.py:78-120): aspect-preserving bilinear
    resize, centered zero padding to a square `image_max_dim` canvas, mean
    subtraction. Returns (molded [D,D,3] float32, window [4] int, scale).
    """
    import cv2

    h, w = image.shape[:2]
    d = config.image_max_dim
    scale = max(1.0, config.image_min_dim / min(h, w))
    if config.image_min_scale:
        scale = max(scale, config.image_min_scale)
    scale = min(scale, d / max(h, w))
    new_h, new_w = int(round(h * scale)), int(round(w * scale))
    if scale != 1.0:
        image = cv2.resize(
            image.astype(np.float32), (new_w, new_h), interpolation=cv2.INTER_LINEAR
        )
    top = (d - new_h) // 2
    left = (d - new_w) // 2
    canvas = np.zeros((d, d, 3), np.float32)
    canvas[top : top + new_h, left : left + new_w] = image
    canvas -= np.asarray(config.mean_pixel, np.float32)
    window = np.array([top, left, top + new_h, left + new_w], np.int32)
    return canvas, window, scale


def unmold_detections(
    detections: Array,
    window: Array,
    image_shape: Tuple[int, int],
    original_shape: Array,
) -> Tuple[Array, Array, Array, Array]:
    """Back-project detections to original-image pixel coordinates, on device.

    ≙ `unmold_detection` (detection.py:8-53) but fixed-shape: instead of
    np.delete'ing empty rows it returns a validity mask.

    Args:
      detections: [N, 6] (y1, x1, y2, x2, class_id, score) normalized,
        zero-padded.
      window: [4] pixel window in the molded image.
      image_shape: static (h, w) of the molded image.
      original_shape: [2] (h, w) of the original image (may be traced).

    Returns:
      (boxes [N, 4] int32 pixel coords, class_ids [N] int32, scores [N],
       valid [N] bool).
    """
    boxes = detections[:, :4]
    class_ids = detections[:, 4].astype(jnp.int32)
    scores = detections[:, 5]

    nwin = norm_boxes(window, image_shape)
    wy1, wx1, wy2, wx2 = nwin[0], nwin[1], nwin[2], nwin[3]
    shift = jnp.stack([wy1, wx1, wy1, wx1])
    scale = jnp.stack([wy2 - wy1, wx2 - wx1, wy2 - wy1, wx2 - wx1])
    boxes = (boxes - shift) / scale

    oh = original_shape[0]
    ow = original_shape[1]
    scale_px = jnp.stack([oh - 1, ow - 1, oh - 1, ow - 1]).astype(jnp.float32)
    shift_px = jnp.array([0.0, 0.0, 1.0, 1.0])
    pix = jnp.around(boxes * scale_px + shift_px).astype(jnp.int32)

    area = (pix[:, 2] - pix[:, 0]) * (pix[:, 3] - pix[:, 1])
    valid = (class_ids > 0) & (area > 0)
    return pix, class_ids, scores, valid


def unmold_detections_np(
    detections: np.ndarray,
    window: np.ndarray,
    image_shape: Tuple[int, int],
    original_shape,
):
    """Host numpy mirror of :func:`unmold_detections` (same math, no device
    dispatches) for eval loops that postprocess per image on the host."""
    detections = np.asarray(detections)
    boxes = detections[:, :4]
    class_ids = detections[:, 4].astype(np.int32)
    scores = detections[:, 5]

    h, w = image_shape
    nwin = (np.asarray(window, np.float64) - np.array([0, 0, 1, 1])) / np.array(
        [h - 1, w - 1, h - 1, w - 1]
    )
    wy1, wx1, wy2, wx2 = nwin
    shift = np.array([wy1, wx1, wy1, wx1])
    scale = np.array([wy2 - wy1, wx2 - wx1, wy2 - wy1, wx2 - wx1])
    boxes = (boxes - shift) / scale

    oh, ow = float(original_shape[0]), float(original_shape[1])
    pix = np.around(
        boxes * np.array([oh - 1, ow - 1, oh - 1, ow - 1]) + np.array([0, 0, 1, 1])
    ).astype(np.int32)
    area = (pix[:, 2] - pix[:, 0]) * (pix[:, 3] - pix[:, 1])
    valid = (class_ids > 0) & (area > 0)
    return pix, class_ids, scores, valid


def unmold_masks(
    masks: Array,
    detections: Array,
    window: Array,
    image_shape: Tuple[int, int],
) -> Array:
    """Project per-ROI 28² mask logits onto molded-image-window coordinates.

    Returns soft masks resampled info per-detection boxes is left to callers
    (full-image paste is a host-side visualization concern); here we return
    the per-detection mask for its predicted class: [N, mh, mw].
    """
    class_ids = detections[:, 4].astype(jnp.int32)
    # masks: [N, mh, mw, C] → select each detection's class channel
    sel = jnp.take_along_axis(
        masks, class_ids[:, None, None, None], axis=-1
    )[..., 0]
    return sel
