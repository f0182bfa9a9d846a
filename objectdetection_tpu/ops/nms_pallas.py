"""Pallas TPU kernel for greedy NMS.

The XLA implementation in `ops/nms.py` runs the suppression tile loop as ~12
fori_loop iterations whose [N, T] IoU blocks round-trip through HBM. This
kernel runs the ENTIRE suppression pass in one `pallas_call`: the box table
(≤6K boxes ≈ 100 KB) and the alive mask stay in VMEM for the whole loop, each
tile's IoU block is computed and consumed in-register, and only the final
surviving box table is written back.

Mosaic-lowering constraints honored: everything is 2D, slicing happens only
on refs (`pl.ds`), and there are NO transposes — the boxes are passed in both
[N, 4] and [4, N] layouts (host-side prep), and column↔row mask reorientation
uses a diagonal-broadcast reduce (`_col_to_row`).

Same greedy semantics as `ops.nms` (the reference/fallback): boxes pre-sorted
by score descending, suppressed boxes zeroed, optional class-aware
suppression.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iou_rows(a: Array, by1, bx1, by2, bx2) -> Array:
    """a: [M, 4]; b given as four [1, K] row vectors → IoU [M, K]."""
    ay1, ax1, ay2, ax2 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
    inter_y = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter_x = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    inter = inter_y * inter_x
    area_a = (ay2 - ay1) * (ax2 - ax1)  # [M, 1]
    area_b = (by2 - by1) * (bx2 - bx1)  # [1, K]
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _col_to_row(x_col: Array) -> Array:
    """[T, 1] bool → [1, T] without a transpose (diagonal broadcast+reduce)."""
    t = x_col.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    return jnp.any(x_col & (r == c), axis=0, keepdims=True)


def _nms_kernel(
    boxes_ref,  # [N, 4] f32, score-sorted, invalid rows zeroed
    boxes_t_ref,  # [4, N] f32, same data transposed (host-side)
    cls_col_ref,  # [N, 1] i32
    cls_row_ref,  # [1, N] i32
    out_ref,  # [N, 4] f32 survivors (zeros = dead)
    alive_ref,  # scratch [1, N] i32
    *,
    tile_size: int,
    iou_threshold: float,
):
    n = boxes_ref.shape[0]
    t = tile_size
    num_tiles = n // t

    alive_ref[:] = jnp.ones((1, n), jnp.int32)
    cols_n = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    all_y1 = boxes_t_ref[0:1, :]
    all_x1 = boxes_t_ref[1:2, :]
    all_y2 = boxes_t_ref[2:3, :]
    all_x2 = boxes_t_ref[3:4, :]

    def tile_body(i, carry):
        start = i * t
        tile = boxes_ref[pl.ds(start, t), :]  # [T, 4]
        tcls_col = cls_col_ref[pl.ds(start, t), :]  # [T, 1]
        tcls_row = cls_row_ref[:, pl.ds(start, t)]  # [1, T]

        # cross-tile: killed by any alive same-class box in earlier tiles
        iou_tn = _iou_rows(tile, all_y1, all_x1, all_y2, all_x2)  # [T, N]
        suppressor = (alive_ref[0:1, :] > 0) & (cols_n < start)  # [1, N]
        same = tcls_col == cls_row_ref[:]  # [T, N]
        cross_ok = ~jnp.any(
            (iou_tn > iou_threshold) & same & suppressor, axis=1, keepdims=True
        )  # [T, 1]

        # within-tile greedy fixpoint (earlier row j kills later row i)
        ty1 = boxes_t_ref[0:1, pl.ds(start, t)]
        tx1 = boxes_t_ref[1:2, pl.ds(start, t)]
        ty2 = boxes_t_ref[2:3, pl.ds(start, t)]
        tx2 = boxes_t_ref[3:4, pl.ds(start, t)]
        tin = _iou_rows(tile, ty1, tx1, ty2, tx2)  # [T, T]
        r = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        sup = (
            (tin > iou_threshold) & (c < r) & (tcls_col == tcls_row)
        )  # sup[i, j]: j kills i

        # while-loop carries are int32 masks — i1 vector carries fail to
        # legalize in Mosaic's scf.yield lowering.
        def cond(state):
            alive_col, prev, it = state
            return (it < t) & jnp.any(alive_col != prev)

        def body(state):
            alive_col, _, it = state
            alive_row = _col_to_row(alive_col > 0)  # [1, T] bool
            killed = jnp.any(sup & alive_row, axis=1, keepdims=True)
            new_alive = (cross_ok & ~killed).astype(jnp.int32)
            return (new_alive, alive_col, it + 1)

        a0 = cross_ok.astype(jnp.int32)
        a1, _, _ = body((a0, a0, jnp.int32(0)))
        alive_col, _, _ = jax.lax.while_loop(cond, body, (a1, a0, jnp.int32(1)))

        out_ref[pl.ds(start, t), :] = jnp.where(alive_col > 0, tile, 0.0)
        alive_ref[0:1, pl.ds(start, t)] = _col_to_row(alive_col > 0).astype(
            jnp.int32
        )
        return carry

    jax.lax.fori_loop(0, num_tiles, tile_body, jnp.int32(0))


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

    Non-differentiable by construction (zero tangent): greedy NMS selection
    is piecewise constant, and pallas_call has no JVP rule — this keeps the
    kernel usable under `jax.grad` (the detector stops gradients at
    proposals anyway, matching the reference's stop_gradient at ROI boxes).
    """
    if interpret is None:  # compiled on TPU, interpreted elsewhere (CI)
        interpret = jax.default_backend() != "tpu"
    return _nms_suppress_nd(
        sorted_boxes, class_ids, float(iou_threshold), int(tile_size),
        bool(interpret),
    )


@functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3, 4))
def _nms_suppress_nd(sorted_boxes, class_ids, iou_threshold, tile_size, interpret):
    return _nms_suppress_impl(
        sorted_boxes, class_ids, iou_threshold, tile_size, interpret
    )


@_nms_suppress_nd.defjvp
def _nms_suppress_jvp(iou_threshold, tile_size, interpret, primals, tangents):
    out = _nms_suppress_nd(*primals, iou_threshold, tile_size, interpret)
    return out, jnp.zeros_like(out)


def _nms_suppress_impl(
    sorted_boxes: Array,
    class_ids: Array,
    iou_threshold: float,
    tile_size: int,
    interpret: bool,
) -> Array:
    n = sorted_boxes.shape[0]
    assert n % tile_size == 0, (n, tile_size)
    kernel = functools.partial(
        _nms_kernel, tile_size=tile_size, iou_threshold=iou_threshold
    )
    boxes = sorted_boxes.astype(jnp.float32)
    cls = class_ids.astype(jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, n), jnp.int32)],
        interpret=interpret,
    )(boxes, boxes.T, cls[:, None], cls[None, :])
