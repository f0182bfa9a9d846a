"""Decompose the proposal layer's 27 ms/batch32: top-k vs decode vs NMS.

Also measures exact lax.top_k vs approx_max_k and a two-stage exact top-k
(per-block top-k then merge) over the 261,888-anchor score table.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_tpu.anchors import config_anchors
from objectdetection_tpu.config import COCO_CONFIG
from objectdetection_tpu.geometry import apply_box_deltas, clip_boxes
from objectdetection_tpu.ops.nms import nms_boxes

import argparse
_ap = argparse.ArgumentParser()
_ap.add_argument("--batch", type=int, default=32)
B = _ap.parse_args().batch
PRE = 6000
POST = 1000


def timed(fn, args, iters, label):
    float(fn(jnp.int32(1), *args))
    float(fn(jnp.int32(1), *args))
    t0 = time.time(); float(fn(jnp.int32(1), *args)); t1 = time.time() - t0
    t0 = time.time(); float(fn(jnp.int32(1 + iters), *args)); tm = time.time() - t0
    ms = 1000.0 * max(tm - t1, 0.0) / iters
    print(f"{label:44s} {ms:8.2f} ms/batch", flush=True)
    return ms


def main():
    cfg = COCO_CONFIG
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    anchors = jnp.asarray(config_anchors(cfg))
    a = anchors.shape[0]
    key = jax.random.PRNGKey(0)
    scores = jax.jit(lambda k: jax.random.uniform(k, (B, a)))(key)
    deltas = jax.jit(
        lambda k: 0.1 * jax.random.normal(k, (B, a, 4))
    )(jax.random.fold_in(key, 1))
    print(f"anchors: {a}", file=sys.stderr, flush=True)

    def loop(stage):
        @jax.jit
        def run(n, scores, deltas):
            def body(_, carry):
                s, acc = carry
                acc = acc + stage(s, deltas)
                return s + 1e-20 * acc, acc
            return jax.lax.fori_loop(0, n, body, (scores, jnp.float32(0)))[1]
        return run

    def stage_topk(s, d):
        ts, ix = jax.vmap(lambda si: jax.lax.top_k(si, PRE))(s)
        return jnp.sum(ts) + jnp.sum(ix[:, 0].astype(jnp.float32))

    def stage_approx(s, d):
        ts, ix = jax.vmap(
            lambda si: jax.lax.approx_max_k(si, PRE, recall_target=0.98)
        )(s)
        return jnp.sum(ts) + jnp.sum(ix[:, 0].astype(jnp.float32))

    def stage_twostage(s, d):
        # exact top-PRE via per-block top-k then a global top-k over
        # the (num_blocks * PRE-per-block) survivors. Exact when each block
        # keeps min(block, PRE) candidates — here blocks of 32736 keep
        # PRE=6000, so any global top-6000 member survives its block cut.
        nb = 8
        blk = s.reshape(B, nb, a // nb)
        bs, bix = jax.vmap(jax.vmap(lambda si: jax.lax.top_k(si, PRE)))(blk)
        off = (jnp.arange(nb, dtype=jnp.int32) * (a // nb))[None, :, None]
        cand_ix = (bix + off).reshape(B, nb * PRE)
        cand_s = bs.reshape(B, nb * PRE)
        ts, ii = jax.vmap(lambda si: jax.lax.top_k(si, PRE))(cand_s)
        ix = jnp.take_along_axis(cand_ix, ii, axis=1)
        return jnp.sum(ts) + jnp.sum(ix[:, 0].astype(jnp.float32))

    def stage_decode(s, d):
        # gather + decode + clip on a fixed index set
        ix = jnp.tile(jnp.arange(PRE, dtype=jnp.int32)[None], (B, 1))
        td = jnp.take_along_axis(d, ix[..., None], axis=1)
        ta = jnp.take(anchors, ix, axis=0)
        boxes = apply_box_deltas(
            ta.reshape(-1, 4), td.reshape(-1, 4)
        ).reshape(B, PRE, 4)
        boxes = clip_boxes(boxes, jnp.array([0.0, 0.0, 1.0, 1.0]))
        return jnp.sum(boxes)

    def stage_nms(s, d):
        boxes = jax.vmap(
            lambda si: apply_box_deltas(anchors[:PRE], d[0, :PRE] * si[:1])
        )(s[:, :1])
        sc = s[:, :PRE]
        out = jax.vmap(
            lambda b, sc_: nms_boxes(
                b, sc_, POST, cfg.rpn_nms_threshold, assume_sorted=True
            )
        )(boxes, sc)
        return jnp.sum(out)

    it = 10
    timed(loop(stage_topk), (scores, deltas), it, "top_k 6000 of 262k (vmapped)")
    timed(loop(stage_approx), (scores, deltas), it, "approx_max_k 6000 (recall .98)")
    timed(loop(stage_twostage), (scores, deltas), it, "two-stage exact top-k (8 blocks)")
    timed(loop(stage_decode), (scores, deltas), it, "gather+decode+clip 6000")
    timed(loop(stage_nms), (scores, deltas), it, "NMS 6000->1000 (pallas, vmapped)")


if __name__ == "__main__":
    main()
