"""Does approx_max_k change WHICH proposals survive? (accuracy gate for
flipping config.use_approx_topk).

`jax.lax.approx_max_k(recall_target=0.98)` guarantees >= 98% expected
recall of the true top-k — but the k=6000 pre-NMS set only matters through
the post-NMS top-1000. This measures, on TPU (the CPU lowering is exact so
this is meaningless off-TPU):

1. recall of the true top-1000 / top-6000 scores inside the approx top-6000
   (the misses should concentrate in the low ranks),
2. the end-to-end check: run the FULL proposal layer (top-k -> decode ->
   clip -> NMS) both ways and report the IoU>=0.99 match rate of the
   post-NMS proposal sets, weighted toward the top ranks.

Score distributions: uniform (worst case: the rank-6000 boundary sits in a
dense region) and a trained-RPN-like bimodal mixture (a few % confident
foreground, the rest near zero).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_tpu.anchors import config_anchors
from objectdetection_tpu.config import COCO_CONFIG
from objectdetection_tpu.layers.proposals import proposal_layer

B = 8
PRE = 6000


def score_sets(a, rng):
    uniform = rng.rand(B, a).astype(np.float32)
    # trained-RPN-like: ~2% strong foreground, long tail near 0
    fg = rng.rand(B, a) < 0.02
    bimodal = np.where(
        fg, 0.5 + 0.5 * rng.rand(B, a), 0.02 * rng.rand(B, a)
    ).astype(np.float32)
    return {"uniform": uniform, "bimodal": bimodal}


def rank_recall(scores):
    s = jnp.asarray(scores)
    exact = jax.jit(jax.vmap(lambda x: jax.lax.top_k(x, PRE)[1]))(s)
    approx = jax.jit(
        jax.vmap(
            lambda x: jax.lax.approx_max_k(x, PRE, recall_target=0.98)[1]
        )
    )(s)
    exact, approx = np.asarray(exact), np.asarray(approx)
    r1000 = np.mean(
        [
            len(set(e[:1000]) & set(a)) / 1000.0
            for e, a in zip(exact, approx)
        ]
    )
    r6000 = np.mean(
        [len(set(e) & set(a)) / PRE for e, a in zip(exact, approx)]
    )
    return r1000, r6000


def post_nms_match(scores, rng):
    cfg = COCO_CONFIG
    anchors = jnp.asarray(config_anchors(cfg))
    a = anchors.shape[0]
    deltas = jnp.asarray(0.1 * rng.randn(B, a, 4).astype(np.float32))
    probs = jnp.stack(
        [1.0 - jnp.asarray(scores), jnp.asarray(scores)], axis=-1
    )

    def run(approx):
        c = cfg.replace(use_approx_topk=approx)
        return jax.jit(
            lambda p, d: proposal_layer(p, d, anchors, c, training=False)
        )(probs, deltas)

    pe = np.asarray(run(False))
    pa = np.asarray(run(True))

    def match_rate(be, ba, topn):
        be, ba = be[:topn], ba
        y1 = np.maximum(be[:, None, 0], ba[None, :, 0])
        x1 = np.maximum(be[:, None, 1], ba[None, :, 1])
        y2 = np.minimum(be[:, None, 2], ba[None, :, 2])
        x2 = np.minimum(be[:, None, 3], ba[None, :, 3])
        inter = np.clip(y2 - y1, 0, None) * np.clip(x2 - x1, 0, None)
        area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        iou = inter / (area(be)[:, None] + area(ba)[None, :] - inter + 1e-9)
        return float((iou.max(axis=1) >= 0.99).mean())

    m100 = np.mean([match_rate(e, a_, 100) for e, a_ in zip(pe, pa)])
    mall = np.mean([match_rate(e, a_, pe.shape[1]) for e, a_ in zip(pe, pa)])
    return m100, mall


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    cfg = COCO_CONFIG
    a = np.asarray(config_anchors(cfg)).shape[0]
    rng = np.random.RandomState(0)
    for name, scores in score_sets(a, rng).items():
        r1000, r6000 = rank_recall(scores)
        m100, mall = post_nms_match(scores, np.random.RandomState(1))
        print(
            f"{name:8s} recall@top1000={r1000:.4f} recall@top6000={r6000:.4f}"
            f"  post-NMS match top100={m100:.4f} all={mall:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
