"""Pallas TPU kernel for greedy NMS.

The XLA implementation in `ops/nms.py` runs the suppression tile loop as ~12
fori_loop iterations whose [N, T] IoU blocks round-trip through HBM. This
kernel runs the ENTIRE suppression pass in one `pallas_call`: the box table
(≤6K boxes ≈ 100 KB) and the survivor state stay in VMEM for the whole loop,
each tile's IoU block is computed and consumed in-register, and only the
final surviving box table is written back.

Two structural optimizations over the naive [T, N]-per-tile formulation
(which measured 33 ms/batch96 on the 6144→1000 proposal workload):

1. **Compacted suppressor buffer.** Only *surviving* higher-scored boxes can
   suppress, and the caller only consumes the top `budget` survivors — so
   the cross-tile IoU runs against a dense [4, CAP] buffer of survivors
   (CAP = budget + tile, lane-rounded) instead of all N earlier rows:
   [T, CAP] work per tile instead of [T, N] (6144 → 1280 columns for the
   proposal layer). New survivors are appended with a one-hot matmul
   scatter (positions from a triangular-matmul prefix sum — Mosaic has no
   cumsum/scatter).
2. **Budget early-exit.** Greedy NMS's first `budget` survivors don't
   depend on later boxes, so once the buffer holds `budget` survivors the
   tile loop stops; remaining rows are emitted as suppressed (the caller's
   finalize takes the top `budget` survivors in score order either way).
   On realistic sparse-overlap inputs this processes a fraction of tiles.

Mosaic-lowering constraints honored: everything is 2D, slicing happens only
on refs (`pl.ds`), and there are NO transposes — the boxes are passed in both
[N, 4] and [4, N] layouts (host-side prep), and column↔row mask reorientation
uses a diagonal-broadcast reduce (`_col_to_row`).

Same greedy semantics as `ops.nms` (the reference/fallback): boxes pre-sorted
by score descending, suppressed boxes zeroed, optional class-aware
suppression; parity-tested against the serial numpy reference in
tests/test_nms_pallas.py.
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
    sup_boxes_ref,  # scratch [4, CAP] f32: compacted survivor table
    sup_cls_ref,  # scratch [1, CAP] f32: survivor class + 2 (0 = empty slot)
    *,
    tile_size: int,
    iou_threshold: float,
    budget: int,
    cap: int,
):
    n = boxes_ref.shape[0]
    t = tile_size
    num_tiles = n // t

    # rows of skipped tiles (budget early-exit) must read as suppressed
    out_ref[:] = jnp.zeros((n, 4), jnp.float32)
    # empty suppressor slots: zero boxes (IoU 0 with everything) + class
    # code 0 (real codes are cls+2 >= 1, pad-class -1 → 1) — they can
    # never suppress, so no validity mask is needed in the tile loop
    sup_boxes_ref[:] = jnp.zeros((4, cap), jnp.float32)
    sup_cls_ref[:] = jnp.zeros((1, cap), jnp.float32)

    cols_cap = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    r_tt = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    c_tt = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    lower_strict = (c_tt < r_tt).astype(jnp.float32)  # [T, T]: j < i

    def tile_cond(state):
        i, count = state
        return (i < num_tiles) & (count < budget)

    def tile_body(state):
        i, count = state
        start = i * t
        tile = boxes_ref[pl.ds(start, t), :]  # [T, 4]
        tcls_col = cls_col_ref[pl.ds(start, t), :]  # [T, 1]
        tcls_row = cls_row_ref[:, pl.ds(start, t)]  # [1, T]

        # cross-tile: killed by any same-class survivor in the buffer
        iou_tc = _iou_rows(
            tile,
            sup_boxes_ref[0:1, :],
            sup_boxes_ref[1:2, :],
            sup_boxes_ref[2:3, :],
            sup_boxes_ref[3:4, :],
        )  # [T, CAP]
        same = (tcls_col + 2).astype(jnp.float32) == sup_cls_ref[:]  # [T, CAP]
        cross_ok = ~jnp.any(
            (iou_tc > iou_threshold) & same, axis=1, keepdims=True
        )  # [T, 1]

        # within-tile greedy fixpoint (earlier row j kills later row i)
        ty1 = boxes_t_ref[0:1, pl.ds(start, t)]
        tx1 = boxes_t_ref[1:2, pl.ds(start, t)]
        ty2 = boxes_t_ref[2:3, pl.ds(start, t)]
        tx2 = boxes_t_ref[3:4, pl.ds(start, t)]
        tin = _iou_rows(tile, ty1, tx1, ty2, tx2)  # [T, T]
        sup = (
            (tin > iou_threshold)
            & (c_tt < r_tt)
            & (tcls_col == tcls_row)
        )  # sup[i, j]: j kills i

        # while-loop carries are int32 masks — i1 vector carries fail to
        # legalize in Mosaic's scf.yield lowering.
        def cond(s):
            alive_col, prev, it = s
            return (it < t) & jnp.any(alive_col != prev)

        def body(s):
            alive_col, _, it = s
            alive_row = _col_to_row(alive_col > 0)  # [1, T] bool
            killed = jnp.any(sup & alive_row, axis=1, keepdims=True)
            new_alive = (cross_ok & ~killed).astype(jnp.int32)
            return (new_alive, alive_col, it + 1)

        a0 = cross_ok.astype(jnp.int32)
        a1, _, _ = body((a0, a0, jnp.int32(0)))
        alive_col, _, _ = jax.lax.while_loop(cond, body, (a1, a0, jnp.int32(1)))

        out_ref[pl.ds(start, t), :] = jnp.where(alive_col > 0, tile, 0.0)

        # --- append live survivors to the compacted buffer ---
        # "live" excludes all-zero rows (invalid/padded inputs survive the
        # fixpoint but are not survivors): they must not consume buffer
        # slots or count toward the budget.
        # NOTE: everything here is exact VPU arithmetic on purpose — MXU
        # f32 matmuls are bf16-decomposed on v5e and NOT bit-exact, and a
        # coordinate perturbed by 2^-22 flips near-threshold IoU compares
        # (observed: 38% survivor divergence on TPU with a matmul scatter).
        nonzero = jnp.any(tile != 0.0, axis=1, keepdims=True)  # [T, 1]
        live_col = (alive_col > 0) & nonzero  # [T, 1] bool
        live_row = _col_to_row(live_col)  # [1, T] bool
        # strict prefix sum over rows: prefix[i] = #live j < i
        prefix = jnp.sum(
            lower_strict * live_row.astype(jnp.float32), axis=1,
            keepdims=True,
        )  # [T, 1] f32, exact (integer-valued)
        pos = count + prefix.astype(jnp.int32)  # [T, 1] target slot
        onehot = (cols_cap == pos) & live_col  # [T, CAP] bool
        # scatter: each buffer slot receives exactly one row's value —
        # broadcast-select + column reduce, bit-exact
        for ci in range(4):
            coord = tile[:, ci : ci + 1]  # [T, 1]
            sup_boxes_ref[ci : ci + 1, :] = sup_boxes_ref[
                ci : ci + 1, :
            ] + jnp.sum(
                jnp.where(onehot, coord, 0.0), axis=0, keepdims=True
            )
        sup_cls_ref[:, :] = sup_cls_ref[:, :] + jnp.sum(
            jnp.where(onehot, (tcls_col + 2).astype(jnp.float32), 0.0),
            axis=0, keepdims=True,
        )
        count = count + jnp.sum(live_col.astype(jnp.int32))
        return (i + 1, count)

    jax.lax.while_loop(tile_cond, tile_body, (jnp.int32(0), jnp.int32(0)))


def nms_suppress_pallas(
    sorted_boxes: Array,
    class_ids: Array,
    iou_threshold: float,
    tile_size: int = 256,
    budget: int | None = None,
    interpret: bool | None = None,
) -> Array:
    """Run greedy suppression over score-sorted boxes; returns the box table
    with suppressed rows zeroed. sorted_boxes [N, 4] f32, class_ids [N] int32.
    N must be a multiple of tile_size (pad with zero boxes / class -1).

    `budget`: the caller consumes at most this many survivors (in score
    order) — the kernel stops once that many exist, and rows after the stop
    point are returned as suppressed. Greedy NMS's first `budget` survivors
    are invariant to later boxes, so the consumed result is identical.
    None = keep every survivor (full pass).

    Non-differentiable by construction (zero tangent): greedy NMS selection
    is piecewise constant, and pallas_call has no JVP rule — this keeps the
    kernel usable under `jax.grad` (the detector stops gradients at
    proposals anyway, matching the reference's stop_gradient at ROI boxes).
    """
    if interpret is None:  # compiled on TPU, interpreted elsewhere (CI)
        interpret = jax.default_backend() != "tpu"
    n = sorted_boxes.shape[0]
    budget = n if budget is None else min(int(budget), n)
    return _nms_suppress_nd(
        sorted_boxes, class_ids, float(iou_threshold), int(tile_size),
        int(budget), bool(interpret),
    )


@functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3, 4, 5))
def _nms_suppress_nd(
    sorted_boxes, class_ids, iou_threshold, tile_size, budget, interpret
):
    return _nms_suppress_impl(
        sorted_boxes, class_ids, iou_threshold, tile_size, budget, interpret
    )


@_nms_suppress_nd.defjvp
def _nms_suppress_jvp(
    iou_threshold, tile_size, budget, interpret, primals, tangents
):
    out = _nms_suppress_nd(
        *primals, iou_threshold, tile_size, budget, interpret
    )
    return out, jnp.zeros_like(out)


def _nms_suppress_impl(
    sorted_boxes: Array,
    class_ids: Array,
    iou_threshold: float,
    tile_size: int,
    budget: int,
    interpret: bool,
) -> Array:
    n = sorted_boxes.shape[0]
    assert n % tile_size == 0, (n, tile_size)
    # suppressor capacity: budget survivors + one tile's worth of headroom
    # (the stop check runs AFTER a whole tile is appended), lane-rounded
    cap = -(-(budget + tile_size) // 128) * 128
    kernel = functools.partial(
        _nms_kernel,
        tile_size=tile_size,
        iou_threshold=iou_threshold,
        budget=budget,
        cap=cap,
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
        scratch_shapes=[
            pltpu.VMEM((4, cap), jnp.float32),
            pltpu.VMEM((1, cap), jnp.float32),
        ],
        interpret=interpret,
    )(boxes, boxes.T, cls[:, None], cls[None, :])
