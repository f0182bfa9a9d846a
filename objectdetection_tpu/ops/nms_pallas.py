"""Pallas TPU kernel for greedy NMS.

The XLA implementation in `ops/nms.py` runs the suppression tile loop as ~12
fori_loop iterations whose [N, T] IoU blocks round-trip through HBM. This
kernel runs the ENTIRE suppression pass in one `pallas_call`: the sorted box
table (≤6K boxes ≈ 100 KB) lives in VMEM for the whole loop, each tile's IoU
block is computed and consumed in-register, and only the final surviving box
table is written back — one HBM read + one write total.

Same greedy semantics as `ops.nms` (which remains the reference/fallback):
boxes pre-sorted by score descending, suppressed boxes zeroed, optional
class-aware suppression.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iou_block(a: Array, b: Array) -> Array:
    """[N, 4] × [T, 4] → [N, T] IoU (zero boxes → IoU 0)."""
    ay1, ax1, ay2, ax2 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
    by1, bx1, by2, bx2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    inter_y = jnp.maximum(
        jnp.minimum(ay2, by2[None, :]) - jnp.maximum(ay1, by1[None, :]), 0.0
    )
    inter_x = jnp.maximum(
        jnp.minimum(ax2, bx2[None, :]) - jnp.maximum(ax1, bx1[None, :]), 0.0
    )
    inter = inter_y * inter_x
    area_a = (ay2 - ay1) * (ax2 - ax1)
    area_b = (by2 - by1) * (bx2 - bx1)
    union = area_a + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _nms_kernel(boxes_ref, class_ref, out_ref, *, tile_size, iou_threshold):
    """boxes_ref: [N, 4] score-sorted (invalid already zeroed);
    class_ref: [N, 1] int32; out_ref: [N, 4] surviving boxes (zeros = dead)."""
    n = boxes_ref.shape[0]
    t = tile_size
    num_tiles = n // t

    out_ref[:] = boxes_ref[:]
    cls = class_ref[:, 0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    def tile_body(i, _):
        start = i * t
        tile = out_ref[pl.ds(start, t), :]
        tile_cls = jax.lax.dynamic_slice(cls, (start,), (t,))

        # suppression by all earlier surviving boxes (zeroed rows → IoU 0)
        iou = _iou_block(out_ref[:], tile)  # [N, T]
        earlier = (rows < start)[:, None]
        same = cls[:, None] == tile_cls[None, :]
        killed = jnp.any((iou > iou_threshold) & earlier & same, axis=0)
        tile = jnp.where(killed[:, None], 0.0, tile)

        # within-tile greedy fixpoint
        tin = _iou_block(tile, tile)
        r = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        sup = (
            (tin > iou_threshold)
            & (r < c)
            & (tile_cls[:, None] == tile_cls[None, :])
        )

        def cond(state):
            alive, prev, it = state
            return (it < t) & jnp.any(alive != prev)

        def body(state):
            alive, _, it = state
            dead = jnp.any(sup & alive[:, None], axis=0)
            return (~dead, alive, it + 1)

        alive0 = jnp.ones((t,), bool)
        alive1 = ~jnp.any(sup, axis=0)
        alive, _, _ = jax.lax.while_loop(cond, body, (alive1, alive0, jnp.int32(1)))
        tile = jnp.where(alive[:, None], tile, 0.0)

        out_ref[pl.ds(start, t), :] = tile
        return 0

    jax.lax.fori_loop(0, num_tiles, tile_body, 0)


def nms_suppress_pallas(
    sorted_boxes: Array,
    class_ids: Array,
    iou_threshold: float,
    tile_size: int = 256,
    interpret: bool | None = None,
) -> Array:
    """Run greedy suppression over score-sorted boxes; returns the box table
    with suppressed rows zeroed. sorted_boxes [N, 4] f32, class_ids [N] int32.
    N must be a multiple of tile_size (pad with zero boxes / class -1).
    """
    if interpret is None:  # compiled on TPU, interpreted elsewhere (CI)
        interpret = jax.default_backend() != "tpu"
    n = sorted_boxes.shape[0]
    assert n % tile_size == 0, (n, tile_size)
    kernel = functools.partial(
        _nms_kernel, tile_size=tile_size, iou_threshold=iou_threshold
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sorted_boxes.astype(jnp.float32), class_ids.astype(jnp.int32)[:, None])
