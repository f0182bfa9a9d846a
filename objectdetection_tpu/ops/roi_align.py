"""Multilevel ROIAlign (crop-and-resize) for TPU.

Replaces the reference's per-level `tf.where → gather_nd →
tf.image.crop_and_resize → re-sort` dance (`maskrcnn.py:104-187`) with a
static-shape flattened-pyramid gather:

1. every FPN level [H_l, W_l, C] is flattened row-major and concatenated into
   one [sum(H_l*W_l), C] table with per-level offsets (trace-time constants),
2. each ROI's pyramid level is computed with the FPN assignment rule
   (`maskrcnn.py:104-122`) — a per-ROI scalar, not a partition,
3. bilinear sample positions for the ROI's level become flat row indices, so
   the whole batch of (ROI × sample-point × 4 corners) reads is ONE gather —
   no dynamic shapes, no re-sorting, identical output ordering to the input
   ROIs by construction.

Bilinear semantics match `tf.image.crop_and_resize(method="bilinear")`: for an
output grid of size P, sample point i lies at ``y1*(H-1) + i*(y2-y1)*(H-1)/(P-1)``
(boxes in normalized coordinates, corner-aligned).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def _bilinear_weights_1d(coord: Array, size: Array):
    """coord: [...] continuous position in [0, size-1]. Returns (i0, i1, w1)."""
    i0 = jnp.floor(coord)
    w1 = coord - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, size - 1)
    i0 = jnp.clip(i0, 0, size - 1)
    return i0, i1, w1


def crop_and_resize(
    image: Array, boxes: Array, crop_size: Tuple[int, int]
) -> Array:
    """Bilinear crop from one feature map: [H, W, C] × [R, 4] → [R, ph, pw, C].

    Boxes are normalized (y1, x1, y2, x2). Single-level building block, ≙
    `tf.image.crop_and_resize` for one image (used by the Faster R-CNN head,
    `FasterRCNN/building_blocks/fastrcnn.py:22-70`).
    """
    h, w, c = image.shape
    ph, pw = crop_size
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]

    def grid(p, lo, hi, size):
        steps = jnp.arange(p, dtype=jnp.float32)
        if p > 1:
            return lo[:, None] * (size - 1) + steps[None, :] * (
                (hi - lo)[:, None] * (size - 1) / (p - 1)
            )
        return 0.5 * (lo + hi)[:, None] * (size - 1)

    ys = grid(ph, y1, y2, h)  # [R, ph]
    xs = grid(pw, x1, x2, w)  # [R, pw]

    y0i, y1i, wy = _bilinear_weights_1d(ys, h)
    x0i, x1i, wx = _bilinear_weights_1d(xs, w)

    flat = image.reshape(h * w, c)

    def take(yi, xi):  # [R, ph], [R, pw] → [R, ph, pw, C]
        idx = yi[:, :, None] * w + xi[:, None, :]
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            idx.shape[0], ph, pw, c
        )

    top = take(y0i, x0i) * (1 - wx)[:, None, :, None] + take(y0i, x1i) * wx[
        :, None, :, None
    ]
    bot = take(y1i, x0i) * (1 - wx)[:, None, :, None] + take(y1i, x1i) * wx[
        :, None, :, None
    ]
    out = top * (1 - wy)[:, :, None, None] + bot * wy[:, :, None, None]

    # tf.image.crop_and_resize extrapolation: sample points outside the
    # image are 0 (matters when boxes exceed [0, 1], e.g. mini-mask crops)
    inside = (
        (ys >= 0) & (ys <= h - 1)
    )[:, :, None] & ((xs >= 0) & (xs <= w - 1))[:, None, :]
    return jnp.where(inside[..., None], out, 0.0)


def roi_levels(
    boxes: Array,
    image_area: float,
    min_level: int = 2,
    max_level: int = 5,
    canonical_level: int = 4,
    canonical_size: float = 224.0,
) -> Array:
    """FPN level assignment per ROI. ≙ maskrcnn.py:104-122.

    boxes: [..., 4] normalized. Returns int32 levels in [min_level, max_level].
    """
    h = boxes[..., 2] - boxes[..., 0]
    w = boxes[..., 3] - boxes[..., 1]
    scale = jnp.sqrt(jnp.maximum(h * w, 1e-12)) / (
        canonical_size / np.sqrt(image_area)
    )
    lvl = canonical_level + jnp.round(jnp.log2(scale)).astype(jnp.int32)
    # zero-area boxes pin to the FINEST level, matching the reference:
    # log2(sqrt(0)) = -inf there, so max(min_k, ...) lands on min_level
    # (maskrcnn.py:119-121). Found by the end-to-end reference golden —
    # pooled features (and thus head scores) of degenerate clipped
    # proposals diverged when these rows used max_level instead.
    lvl = jnp.where(h * w > 0, lvl, min_level)
    return jnp.clip(lvl, min_level, max_level)


def multilevel_roi_align(
    features: Sequence[Array],
    boxes: Array,
    image_shape: Tuple[int, int],
    crop_size: Tuple[int, int],
    min_level: int = 2,
) -> Array:
    """ROIAlign across an FPN pyramid for one image.

    Args:
      features: per-level [H_l, W_l, C] maps, finest first (P2..P5).
      boxes: [R, 4] normalized proposals.
      image_shape: (h, w) of the model input image.
      crop_size: (ph, pw) output resolution.
      min_level: pyramid level of features[0].

    Returns:
      [R, ph, pw, C] pooled features in the same ROI order as `boxes`.
    """
    num_levels = len(features)
    c = features[0].shape[-1]
    ph, pw = crop_size

    heights = np.array([f.shape[0] for f in features], dtype=np.int32)
    widths = np.array([f.shape[1] for f in features], dtype=np.int32)
    sizes = heights * widths
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)

    flat = jnp.concatenate(
        [f.reshape(-1, c) for f in features], axis=0
    )  # [sum(H*W), C]

    lvl = roi_levels(
        boxes,
        image_area=float(image_shape[0] * image_shape[1]),
        min_level=min_level,
        max_level=min_level + num_levels - 1,
    )
    li = lvl - min_level  # [R] index into level tables
    lh = jnp.take(jnp.asarray(heights), li)  # [R]
    lw = jnp.take(jnp.asarray(widths), li)
    loff = jnp.take(jnp.asarray(offsets), li)

    boxes = jax.lax.stop_gradient(boxes)
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]

    def grid(p, lo, hi, size):
        steps = jnp.arange(p, dtype=jnp.float32)
        sizef = size.astype(jnp.float32)
        if p > 1:
            return lo[:, None] * (sizef[:, None] - 1) + steps[None, :] * (
                (hi - lo)[:, None] * (sizef[:, None] - 1) / (p - 1)
            )
        return 0.5 * (lo + hi)[:, None] * (sizef[:, None] - 1)

    ys = grid(ph, y1, y2, lh)  # [R, ph]
    xs = grid(pw, x1, x2, lw)  # [R, pw]

    y0i, y1i, wy = _bilinear_weights_1d(ys, lh[:, None])
    x0i, x1i, wx = _bilinear_weights_1d(xs, lw[:, None])

    # One fused gather for all 4 bilinear corners (a single [R·ph·pw·4]-row
    # HBM gather — the dominant cost), then a dtype-preserving weighted
    # reduce. Splitting into 4 gathers + fp32 lerps costs ~3x in HBM traffic.
    r = boxes.shape[0]

    def flat_idx(yi, xi):  # [R, ph] × [R, pw] → [R, ph, pw]
        return loff[:, None, None] + yi[:, :, None] * lw[:, None, None] + xi[:, None, :]

    idx4 = jnp.stack(
        [
            flat_idx(y0i, x0i),
            flat_idx(y0i, x1i),
            flat_idx(y1i, x0i),
            flat_idx(y1i, x1i),
        ],
        axis=-1,
    )  # [R, ph, pw, 4]
    gathered = jnp.take(flat, idx4.reshape(-1), axis=0).reshape(r, ph, pw, 4, c)

    wy_ = wy[:, :, None]  # [R, ph, 1]
    wx_ = wx[:, None, :]  # [R, 1, pw]
    w4 = jnp.stack(
        [
            (1 - wy_) * (1 - wx_),
            (1 - wy_) * wx_,
            wy_ * (1 - wx_),
            wy_ * wx_,
        ],
        axis=-1,
    ).astype(flat.dtype)  # [R, ph, pw, 4]
    return jnp.sum(gathered * w4[..., None], axis=-2)


def batched_multilevel_roi_align(
    features: Sequence[Array],
    boxes: Array,
    image_shape: Tuple[int, int],
    crop_size: Tuple[int, int],
    min_level: int = 2,
) -> Array:
    """Batched pyramid ROIAlign: features [B, H_l, W_l, C] × [B, R, 4] →
    [B, R, ph, pw, C].

    NOT a vmap of the per-image version: a vmapped gather batches the operand
    and hits XLA's slow batched-gather path on TPU (~4x slower measured).
    Instead ALL images' pyramids flatten into one [B·Σ(H_l·W_l), C] table and
    every (image, ROI, sample, corner) read is one flat row gather.
    """
    features = list(features)
    b = features[0].shape[0]
    c = features[0].shape[-1]
    num_levels = len(features)
    ph, pw = crop_size
    r = boxes.shape[1]

    heights = np.array([f.shape[1] for f in features], dtype=np.int32)
    widths = np.array([f.shape[2] for f in features], dtype=np.int32)
    sizes = heights * widths
    # level block l starts at B·offset_l; image i's rows at + i·size_l
    level_base = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32) * b

    flat = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)

    lvl = roi_levels(
        boxes,
        image_area=float(image_shape[0] * image_shape[1]),
        min_level=min_level,
        max_level=min_level + num_levels - 1,
    )  # [B, R]
    li = lvl - min_level
    lh = jnp.take(jnp.asarray(heights), li)  # [B, R]
    lw = jnp.take(jnp.asarray(widths), li)
    lsize = jnp.take(jnp.asarray(sizes), li)
    image_idx = jnp.arange(b, dtype=jnp.int32)[:, None]  # [B, 1]
    row0 = jnp.take(jnp.asarray(level_base), li) + image_idx * lsize  # [B, R]

    boxes = jax.lax.stop_gradient(boxes)
    y1, x1, y2, x2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]

    def grid(p, lo, hi, size):
        steps = jnp.arange(p, dtype=jnp.float32)
        sizef = size.astype(jnp.float32)[..., None]
        if p > 1:
            return lo[..., None] * (sizef - 1) + steps * (
                (hi - lo)[..., None] * (sizef - 1) / (p - 1)
            )
        return 0.5 * (lo + hi)[..., None] * (sizef - 1)

    ys = grid(ph, y1, y2, lh)  # [B, R, ph]
    xs = grid(pw, x1, x2, lw)  # [B, R, pw]

    y0i, y1i, wy = _bilinear_weights_1d(ys, lh[..., None])
    x0i, x1i, wx = _bilinear_weights_1d(xs, lw[..., None])

    n = b * r * ph * pw

    def flat_idx(yi, xi):  # [B, R, ph] × [B, R, pw] → [N]
        return (
            row0[..., None, None]
            + yi[..., :, None] * lw[..., None, None]
            + xi[..., None, :]
        ).reshape(-1)

    # Four row gathers combined as a flat-[N, C] FMA. Measured fastest on
    # v5e among: [B,R,ph,pw,4,C] stacked-corner reduce, one concatenated
    # [4N] gather, and lax.gather with 2-row slice_sizes (catastrophically
    # slow). The flat layout matters: a 7-wide second-to-minor dim tiles
    # poorly on the VPU.
    dtype = flat.dtype

    def wprod(a, b_):  # [B, R, ph] × [B, R, pw] → [N, 1]
        return (
            (a[..., :, None] * b_[..., None, :]).reshape(n, 1).astype(dtype)
        )

    g = lambda yi, xi: jnp.take(flat, flat_idx(yi, xi), axis=0)  # [N, C]
    out = (
        g(y0i, x0i) * wprod(1 - wy, 1 - wx)
        + g(y0i, x1i) * wprod(1 - wy, wx)
        + g(y1i, x0i) * wprod(wy, 1 - wx)
        + g(y1i, x1i) * wprod(wy, wx)
    )
    return out.reshape(b, r, ph, pw, c)
