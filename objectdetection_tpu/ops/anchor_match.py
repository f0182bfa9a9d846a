"""Anchor↔GT IoU matching (the RPN target-assignment hot op).

≙ the reference's host-numpy O(A·G) loop (`data_processor.py:204-220`:
per-GT `intersection_over_union` over all 261,888 anchors, then argmax
reductions). Two implementations behind one signature:

- XLA: dense [A, G] IoU + reductions (simple, memory ∝ A·G).
- Pallas: anchors stream through VMEM in tiles; each tile's [T, G] IoU block
  is reduced in-register — per-anchor max/argmax written per tile, per-GT
  running max/argmax accumulated in VMEM scratch across the sequential grid.
  The [A, G] matrix (100 MB at COCO scale) never exists.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from objectdetection_tpu.geometry import iou_matrix


class AnchorMatch(NamedTuple):
    anchor_max: Array  # [A] best IoU per anchor
    anchor_argmax: Array  # [A] index of best GT per anchor
    gt_max: Array  # [G] best IoU per GT
    gt_argmax: Array  # [G] index of best anchor per GT


def anchor_match_xla(anchors: Array, gt_boxes: Array, gt_valid: Array) -> AnchorMatch:
    iou = iou_matrix(anchors, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    return AnchorMatch(
        anchor_max=jnp.max(iou, axis=1),
        anchor_argmax=jnp.argmax(iou, axis=1).astype(jnp.int32),
        gt_max=jnp.max(iou, axis=0),
        gt_argmax=jnp.argmax(iou, axis=0).astype(jnp.int32),
    )


def _match_kernel(
    anchors_ref,  # [T, 4] f32 (blocked over the grid)
    gt_y1_ref, gt_x1_ref, gt_y2_ref, gt_x2_ref,  # [1, G] f32 each
    gt_valid_ref,  # [1, G] i32
    amax_ref,  # out [T, 1] f32
    aarg_ref,  # out [T, 1] i32
    gmax_ref,  # out [1, G] f32
    garg_ref,  # out [1, G] i32
    *,
    tile_size: int,
):
    i = pl.program_id(0)
    t = tile_size

    a = anchors_ref[:]
    ay1, ax1, ay2, ax2 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
    by1, bx1 = gt_y1_ref[:], gt_x1_ref[:]
    by2, bx2 = gt_y2_ref[:], gt_x2_ref[:]

    inter_y = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter_x = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    inter = inter_y * inter_x
    area_a = (ay2 - ay1) * (ax2 - ax1)
    area_b = (by2 - by1) * (bx2 - bx1)
    union = area_a + area_b - inter
    iou = jnp.where(union > 0, inter / union, 0.0)  # [T, G]
    iou = jnp.where(gt_valid_ref[:] > 0, iou, 0.0)

    amax_ref[:] = jnp.max(iou, axis=1, keepdims=True)
    aarg_ref[:] = jnp.argmax(iou, axis=1, keepdims=True).astype(jnp.int32)

    tile_gmax = jnp.max(iou, axis=0, keepdims=True)  # [1, G]
    tile_garg = (
        jnp.argmax(iou, axis=0, keepdims=True).astype(jnp.int32) + i * t
    )

    @pl.when(i == 0)
    def _():
        gmax_ref[:] = tile_gmax
        garg_ref[:] = tile_garg

    @pl.when(i > 0)
    def _():
        better = tile_gmax > gmax_ref[:]
        gmax_ref[:] = jnp.where(better, tile_gmax, gmax_ref[:])
        garg_ref[:] = jnp.where(better, tile_garg, garg_ref[:])


def anchor_match_pallas(
    anchors: Array,
    gt_boxes: Array,
    gt_valid: Array,
    tile_size: int = 2048,
    interpret: Optional[bool] = None,
) -> AnchorMatch:
    """Pallas path; non-differentiable (target assignment carries no
    gradient, and pallas_call has no JVP rule)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _anchor_match_nd(anchors, gt_boxes, gt_valid, tile_size, interpret)


@functools.partial(jax.custom_jvp, nondiff_argnums=(3, 4))
def _anchor_match_nd(anchors, gt_boxes, gt_valid, tile_size, interpret):
    return _anchor_match_impl(anchors, gt_boxes, gt_valid, tile_size, interpret)


@_anchor_match_nd.defjvp
def _anchor_match_jvp(tile_size, interpret, primals, tangents):
    import numpy as np

    out = _anchor_match_nd(*primals, tile_size, interpret)

    def zero_tan(x):
        if jnp.issubdtype(x.dtype, jnp.integer):
            return np.zeros(x.shape, dtype=jax.dtypes.float0)
        return jnp.zeros_like(x)

    return out, jax.tree.map(zero_tan, out)


def _anchor_match_impl(
    anchors: Array,
    gt_boxes: Array,
    gt_valid: Array,
    tile_size: int,
    interpret: bool,
) -> AnchorMatch:
    a = anchors.shape[0]
    g = gt_boxes.shape[0]
    pad = (-a) % tile_size
    anchors_p = jnp.pad(anchors.astype(jnp.float32), ((0, pad), (0, 0)))
    n = a + pad
    num_tiles = n // tile_size

    gtf = gt_boxes.astype(jnp.float32)
    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (tile_size, 4), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            *[
                pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.VMEM)
                for _ in range(5)
            ],
        ],
        out_specs=[
            pl.BlockSpec((tile_size, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_size, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
    )
    amax, aarg, gmax, garg = pl.pallas_call(
        functools.partial(_match_kernel, tile_size=tile_size),
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, g), jnp.float32),
            jax.ShapeDtypeStruct((1, g), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        anchors_p,
        gtf[None, :, 0], gtf[None, :, 1], gtf[None, :, 2], gtf[None, :, 3],
        gt_valid.astype(jnp.int32)[None, :],
    )
    return AnchorMatch(
        anchor_max=amax[:a, 0],
        anchor_argmax=aarg[:a, 0],
        gt_max=gmax[0],
        gt_argmax=garg[0],
    )


_BACKEND_OVERRIDE: Optional[str] = None


def set_anchor_match_backend(backend: Optional[str]) -> None:
    global _BACKEND_OVERRIDE
    assert backend in (None, "xla", "pallas")
    _BACKEND_OVERRIDE = backend


def anchor_match(
    anchors: Array, gt_boxes: Array, gt_valid: Array, backend: Optional[str] = None
) -> AnchorMatch:
    """Match anchors to GT boxes; backend auto-selects pallas on TPU."""
    backend = backend or _BACKEND_OVERRIDE
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        return anchor_match_pallas(anchors, gt_boxes, gt_valid)
    return anchor_match_xla(anchors, gt_boxes, gt_valid)
