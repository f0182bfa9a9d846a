"""Row-level diagnosis of a real-TPU Pallas-vs-XLA ROIAlign divergence.

The r4 smoke run found float max|pallas-xla| = 4.27 on hardware while the
same inputs pass in interpret mode — a Mosaic lowering issue. This script
pinpoints WHICH rows diverge and prints their routing metadata (level,
patch class, no_fit/zero flags, patch origin) so the failing kernel branch
can be identified.

Run:  python benchmarks/align_smoke_debug.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_tpu.ops.roi_align import batched_multilevel_roi_align
from objectdetection_tpu.ops import roi_align_pallas as rap

C = 256
IMAGE = (1024, 1024)


def main():
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(2, s, s, C).astype(np.float32), jnp.bfloat16)
        for s in (256, 128, 64, 32)
    ]
    boxes = []
    for _ in range(40):
        size = np.exp(rng.uniform(np.log(0.01), np.log(0.9)))
        y = rng.uniform(0, 1 - size)
        x = rng.uniform(0, 1 - size)
        ar = np.exp(rng.uniform(np.log(0.5), np.log(2.0)))
        h, w = min(size * ar, 1 - y), min(size / ar, 1 - x)
        boxes.append([y, x, y + h, x + w])
    boxes += [
        [0.0, 0.0, 1.0, 1.0],
        [0.0, 0.0, 0.004, 0.004],
        [0.99, 0.99, 1.0, 1.0],
        [0.3, 0.3, 0.3, 0.3],
        [0.0, 0.0, 0.0, 0.0],
        [0.55, 0.0, 0.55, 1.0],
        [0.1, 0.2, 0.52, 0.62],
        [0.0, 0.0, 0.0, 0.0],
    ]
    boxes_np = np.stack([np.asarray(boxes, np.float32)] * 2)
    boxes = jnp.asarray(boxes_np)
    b, r = boxes.shape[:2]

    pool = 7
    heights = np.array([f.shape[1] for f in feats], np.int32)
    widths = np.array([f.shape[2] for f in feats], np.int32)
    rm = rap._route_and_meta(boxes, IMAGE, heights, widths, pool, 2, b, r)
    li = np.asarray(rm["li"]).reshape(b, r)
    cls = np.asarray(rm["cls"]).reshape(b, r)
    no_fit = np.asarray(rm["no_fit"]).reshape(b, r)
    zero = np.asarray(rm["zero_row"]).reshape(b, r)
    meta = np.asarray(rm["meta"])

    ref = np.asarray(
        batched_multilevel_roi_align(feats, boxes, IMAGE, (pool, pool)),
        np.float32,
    )
    got = np.asarray(
        rap.batched_multilevel_roi_align_pallas(feats, boxes, IMAGE, (pool, pool)),
        np.float32,
    )
    err = np.abs(got - ref).reshape(b, r, -1).max(-1)
    print(f"rows with err > 0.05: {(err > 0.05).sum()} of {b * r}")
    classes = rm["classes"]
    for i in range(b):
        for j in range(r):
            if err[i, j] > 0.05:
                n = i * r + j
                print(
                    f"img {i} roi {j:2d} err {err[i, j]:8.4f} "
                    f"li {li[i, j]} cls {cls[i, j]} "
                    f"({classes[cls[i, j]] if cls[i, j] >= 0 else 'sent'}) "
                    f"no_fit {bool(no_fit[i, j])} zero {bool(zero[i, j])} "
                    f"y0a/8 {meta[n, 3]} x0 {meta[n, 4]} "
                    f"box {boxes_np[i, j].round(4).tolist()}"
                )
    # error histogram by class
    for k in range(-1, len(classes)):
        m = cls == k
        if m.sum():
            print(
                f"class {k:2d} {str(classes[k]) if k >= 0 else 'sentinel':>10s}: "
                f"rows {int(m.sum()):3d} max err {err[m].max():.4f}"
            )


if __name__ == "__main__":
    main()
