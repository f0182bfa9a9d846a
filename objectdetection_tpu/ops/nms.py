"""Fixed-size greedy non-max suppression for TPU.

Replaces the reference's serial C++ `tf.image.non_max_suppression` calls made
inside per-image Python loops (`proposals_tf.py:188-196,218-247`,
`detection.py:172-208`) with a single static-shape program:

- boxes are sorted by score once (XLA `sort` / `top_k`),
- suppression runs tile-by-tile: each tile of ``T`` boxes is first suppressed
  by all surviving higher-scored boxes (one [N, T] IoU block — pure VPU work),
  then self-suppressed to a fixpoint within the tile,
- suppressed boxes are zeroed so they drop out of later IoU blocks for free,
- the output is a fixed-size index list padded with ``-1`` plus a validity
  mask — no dynamic shapes anywhere.

This computes exactly the greedy-NMS result (same keep set as the serial
algorithm; ordering ties between equal scores may differ). Class-aware
suppression (suppress only same-class overlaps) folds the reference's
map-over-unique-classes per-class NMS (`detection.py:172-208`) into the same
single pass.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from objectdetection_tpu.geometry import iou_matrix


class NMSResult(NamedTuple):
    indices: Array  # [max_output] int32, -1 padded, in descending-score order
    valid: Array  # [max_output] bool


def _pad_to_multiple(x: Array, multiple: int, axis: int, value) -> Array:
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _self_suppress(iou: Array, same_class: Array, threshold: float) -> Array:
    """Greedy suppression within one tile of score-sorted boxes.

    iou: [T, T]; same_class: [T, T] bool. Returns alive mask [T].
    Iterates the greedy recurrence to a fixpoint:
        alive[i] = not exists j < i with alive[j] and iou[j, i] > t.
    """
    t = iou.shape[0]
    suppress = (iou > threshold) & same_class
    # only higher-scored (earlier) boxes can suppress
    row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    suppress = suppress & (row < col)

    def cond(state):
        alive, prev_alive, it = state
        return (it < t) & jnp.any(alive != prev_alive)

    def body(state):
        alive, _, it = state
        # box i stays alive if no alive j<i suppresses it
        killed = jnp.any(suppress & alive[:, None], axis=0)
        return (~killed, alive, it + 1)

    alive0 = jnp.ones((t,), dtype=bool)
    killed0 = jnp.any(suppress, axis=0)
    alive1 = ~killed0
    alive, _, _ = jax.lax.while_loop(cond, body, (alive1, alive0, jnp.int32(1)))
    return alive


def default_nms_backend() -> str:
    """'pallas' on TPU, 'xla' elsewhere (module-level override via
    `set_nms_backend`)."""
    if _NMS_BACKEND_OVERRIDE is not None:
        return _NMS_BACKEND_OVERRIDE
    try:
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    except Exception:
        return "xla"


_NMS_BACKEND_OVERRIDE: Optional[str] = None


def set_nms_backend(backend: Optional[str]) -> None:
    """Force 'xla' or 'pallas' globally (None = auto)."""
    global _NMS_BACKEND_OVERRIDE
    assert backend in (None, "xla", "pallas")
    _NMS_BACKEND_OVERRIDE = backend


def non_max_suppression(
    boxes: Array,
    scores: Array,
    max_output: int,
    iou_threshold: float,
    valid: Optional[Array] = None,
    class_ids: Optional[Array] = None,
    tile_size: int = 512,
    backend: Optional[str] = None,
    assume_sorted: bool = False,
) -> NMSResult:
    """Greedy NMS over [N, 4] boxes with [N] scores.

    Args:
      boxes: [N, 4] (y1, x1, y2, x2), any consistent coordinate scale.
      scores: [N].
      max_output: fixed number of output slots.
      iou_threshold: suppress a box when IoU with a kept, higher-scored
        (same-class, if class_ids given) box exceeds this.
      valid: optional [N] bool — boxes to consider at all.
      class_ids: optional [N] int — restrict suppression to equal ids
        (per-class NMS in one pass).
      tile_size: suppression tile width.
      assume_sorted: inputs are already in descending-score order (e.g. they
        came out of `lax.top_k`) — skips the internal sort.

    Returns:
      NMSResult(indices [max_output] int32 (-1 pad), valid [max_output] bool).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    if class_ids is None:
        class_ids = jnp.zeros((n,), dtype=jnp.int32)
    tile_size = min(tile_size, max(n, 1))

    neg_inf = jnp.array(-jnp.inf, dtype=scores.dtype)
    scores = jnp.where(valid, scores, neg_inf)

    if assume_sorted:
        order = jnp.arange(n, dtype=jnp.int32)
        sboxes = boxes.astype(jnp.float32)
        svalid = valid
        sclass = class_ids
    else:
        # Sort descending by score; invalid boxes sink to the end.
        order = jnp.argsort(-scores)
        sboxes = jnp.take(boxes, order, axis=0).astype(jnp.float32)
        svalid = jnp.take(valid, order)
        sclass = jnp.take(class_ids, order)

    # tf.image.non_max_suppression canonicalizes corners (min/max) before
    # computing IoU — matters only for inverted boxes, which real decoded
    # proposals never produce, but exact parity with the reference's NMS
    # requires it (tests/test_reference_goldens.py).
    sboxes = jnp.concatenate(
        [
            jnp.minimum(sboxes[:, 0:2], sboxes[:, 2:4]),
            jnp.maximum(sboxes[:, 0:2], sboxes[:, 2:4]),
        ],
        axis=1,
    )
    # Invalid boxes are zeroed: zero boxes have IoU 0 with everything so
    # they neither suppress nor survive (the all-zero row doubles as the
    # "suppressed" marker in the tile loop below and the Pallas kernel).
    sboxes = jnp.where(svalid[:, None], sboxes, 0.0)

    sboxes = _pad_to_multiple(sboxes, tile_size, axis=0, value=0.0)
    sclass = _pad_to_multiple(sclass, tile_size, axis=0, value=-1)
    n_pad = sboxes.shape[0]
    num_tiles = n_pad // tile_size

    backend = backend or default_nms_backend()
    if backend == "pallas":
        from objectdetection_tpu.ops.nms_pallas import nms_suppress_pallas

        # the kernel tile must divide the padded length — re-pad for its
        # (possibly smaller) tile size (e.g. N=300 → pad 300 → tile 256)
        pt = min(tile_size, 256)  # 512 measured slower (4.1/12.7 vs
        # 2.5/11.3 ms/b96 random/degenerate) — bigger within-tile fixpoints
        pboxes = _pad_to_multiple(sboxes, pt, axis=0, value=0.0)
        pclass = _pad_to_multiple(sclass, pt, axis=0, value=-1)
        # the finalize below consumes at most max_output survivors — the
        # kernel can stop as soon as that many exist (budget early-exit)
        out_boxes = nms_suppress_pallas(
            pboxes, pclass, iou_threshold, tile_size=pt,
            budget=max_output,
        )
        return _finalize(out_boxes, svalid, order, n, max_output)

    def tile_body(i, state_boxes):
        start = i * tile_size
        tile = jax.lax.dynamic_slice(state_boxes, (start, 0), (tile_size, 4))
        tile_cls = jax.lax.dynamic_slice(sclass, (start,), (tile_size,))

        # Cross-tile: IoU of every earlier (surviving) box vs this tile.
        cross_iou = iou_matrix(state_boxes, tile)  # [n_pad, T]
        rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)[:, 0]
        earlier = (rows < start)[:, None]
        same_cls_cross = sclass[:, None] == tile_cls[None, :]
        killed = jnp.any(
            (cross_iou > iou_threshold) & earlier & same_cls_cross, axis=0
        )
        tile = jnp.where(killed[:, None], 0.0, tile)

        # Within-tile greedy fixpoint.
        tile_iou = iou_matrix(tile, tile)
        same_cls = tile_cls[:, None] == tile_cls[None, :]
        alive = _self_suppress(tile_iou, same_cls, iou_threshold)
        tile = jnp.where(alive[:, None], tile, 0.0)

        return jax.lax.dynamic_update_slice(state_boxes, tile, (start, 0))

    out_boxes = jax.lax.fori_loop(0, num_tiles, tile_body, sboxes)
    return _finalize(out_boxes, svalid, order, n, max_output)


def _finalize(out_boxes, svalid, order, n, max_output) -> NMSResult:
    """Survivor table → compact (indices, valid) in descending-score order."""
    # A surviving box is a valid input whose (canonicalized) row was left
    # intact — nonzero, since suppression zeroes rows. Zero-AREA boxes are
    # legitimate survivors exactly as in tf.image.non_max_suppression
    # (their IoU with everything is 0); e.g. proposals clipped flat against
    # the window edge pass through, matching proposals_tf.py:218-247.
    kept = svalid[:n] & jnp.any(out_boxes[:n] != 0.0, axis=1)

    # Compact the first `k` kept indices to the front, preserving score
    # order: top_k over descending-position keys (kept row i ↦ key n-i,
    # dead rows ↦ 0) returns exactly the earliest kept rows in order — a
    # partial top-k instead of the full stable argsort this used to do
    # (the argsort was ~10 ms/batch32 at 6144 rows, over half of NMS time).
    k = min(max_output, n)
    keys = jnp.where(kept, jnp.arange(n, 0, -1, dtype=jnp.int32), 0)
    top_keys, top_rows = jax.lax.top_k(keys, k)
    out_valid = top_keys > 0
    orig_idx = jnp.take(order[:n], top_rows)
    out_idx = jnp.where(out_valid, orig_idx, -1).astype(jnp.int32)
    if k < max_output:
        out_idx = jnp.pad(out_idx, (0, max_output - k), constant_values=-1)
        out_valid = jnp.pad(out_valid, (0, max_output - k))
    return NMSResult(indices=out_idx, valid=out_valid)


def nms_boxes(
    boxes: Array,
    scores: Array,
    max_output: int,
    iou_threshold: float,
    valid: Optional[Array] = None,
    tile_size: int = 512,
    backend: Optional[str] = None,
    assume_sorted: bool = False,
) -> Array:
    """NMS returning the kept boxes zero-padded to [max_output, 4].

    Matches the reference proposal-layer contract
    (`proposals_tf.py:218-247`): gather kept boxes, pad with [0, 0, 0, 0].
    """
    res = non_max_suppression(
        boxes, scores, max_output, iou_threshold, valid=valid,
        tile_size=tile_size, backend=backend, assume_sorted=assume_sorted,
    )
    gathered = jnp.take(boxes, jnp.maximum(res.indices, 0), axis=0)
    return jnp.where(res.valid[:, None], gathered, 0.0)
