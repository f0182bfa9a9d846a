"""TPU head-to-head: Pallas patch-DMA ROIAlign vs XLA gather ROIAlign.

Box-head scale (32x1000 ROIs, 7²) and mask scale (32x100 ROIs, 14²) on
COCO-sized pyramids, plus an on-device numerics check.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_tpu.ops.roi_align import batched_multilevel_roi_align
from objectdetection_tpu.ops.roi_align_pallas import (
    batched_multilevel_roi_align_pallas,
)

B, C = 32, 256
IMAGE = (1024, 1024)


def make_boxes(r, seed):
    rng = np.random.RandomState(seed)
    size = np.exp(rng.uniform(np.log(0.01), np.log(0.9), (B, r)))
    ar = np.exp(rng.uniform(np.log(0.5), np.log(2.0), (B, r)))
    h = np.minimum(size * ar, 0.999)
    w = np.minimum(size / ar, 0.999)
    y = rng.uniform(0, 1, (B, r)) * (1 - h)
    x = rng.uniform(0, 1, (B, r)) * (1 - w)
    boxes = np.stack([y, x, y + h, x + w], axis=-1).astype(np.float32)
    boxes[:, -5:] = 0.0  # padding rows
    return jnp.asarray(boxes)


def timeit(fn, *args, iters=10):
    float(fn(jnp.int32(1), *args))
    t0 = time.time(); float(fn(jnp.int32(1), *args)); t1 = time.time() - t0
    t0 = time.time(); float(fn(jnp.int32(1 + iters), *args)); tm = time.time() - t0
    return max(tm - t1, 1e-9) / iters * 1e3


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)
    feats = [
        jax.jit(
            lambda k, s=s: jax.random.normal(k, (B, s, s, C), jnp.float32).astype(
                jnp.bfloat16
            )
        )(jax.random.fold_in(key, s))
        for s in (256, 128, 64, 32)
    ]

    for r, pool, label in [(1000, 7, "box 32x1000x7²"), (100, 14, "mask 32x100x14²")]:
        boxes = make_boxes(r, r)

        def loop(align):
            @jax.jit
            def run(n, boxes, *feats):
                def body(_, carry):
                    bx, acc = carry
                    out = align(list(feats), bx, IMAGE, (pool, pool))
                    acc = acc + jnp.sum(out.astype(jnp.float32))
                    return bx + 1e-20 * acc, acc
                return jax.lax.fori_loop(0, n, body, (boxes, jnp.float32(0)))[1]
            return run

        ms_x = timeit(loop(batched_multilevel_roi_align), boxes, *feats)
        ms_p = timeit(
            loop(batched_multilevel_roi_align_pallas), boxes, *feats
        )
        print(f"{label}:  xla {ms_x:7.2f} ms   pallas {ms_p:7.2f} ms  "
              f"({ms_x / ms_p:.2f}x)", flush=True)

        # on-device numerics check (compiled Mosaic vs XLA)
        ref = batched_multilevel_roi_align(feats, boxes, IMAGE, (pool, pool))
        got = batched_multilevel_roi_align_pallas(
            feats, boxes, IMAGE, (pool, pool)
        )
        err = jnp.max(
            jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))
        )
        print(f"  max |xla - pallas| = {float(err):.4f}", flush=True)


if __name__ == "__main__":
    main()
