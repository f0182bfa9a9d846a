"""NMS kernel cost exploration: tile-size sweep, batch handling, workloads.

The proposal layer's Pallas NMS measures ~18 ms/batch32 at 6000->1000 —
2/3 of the whole proposal stage. Sweeps tile_size x workload (random vs
heavily-overlapping boxes) to find the fast configuration.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_tpu.ops.nms_pallas import nms_suppress_pallas

B, N = 32, 6144


def make_boxes(mode, seed=0):
    rng = np.random.RandomState(seed)
    if mode == "random":
        yx = rng.rand(B, N, 2) * 0.9
        hw = 0.02 + rng.rand(B, N, 2) * 0.2
    else:  # degenerate: huge overlapping boxes (the random-weight bench)
        yx = rng.rand(B, N, 2) * 0.1
        hw = 0.7 + rng.rand(B, N, 2) * 0.3
    boxes = np.concatenate([yx, np.minimum(yx + hw, 1.0)], axis=-1)
    return jnp.asarray(boxes, jnp.float32)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    cls = jnp.zeros((N,), jnp.int32)

    for mode in ("random", "degenerate"):
        boxes = make_boxes(mode)
        for tile in (128, 256, 512):
            @jax.jit
            def run(n, boxes):
                def body(_, carry):
                    bx, acc = carry
                    out = jax.vmap(
                        lambda b: nms_suppress_pallas(
                            b, cls, 0.7, tile_size=tile, interpret=False
                        )
                    )(bx)
                    acc = acc + jnp.sum(out)
                    return bx + 1e-20 * acc, acc
                return jax.lax.fori_loop(0, n, body, (boxes, jnp.float32(0)))[1]

            float(run(jnp.int32(1), boxes))
            float(run(jnp.int32(1), boxes))
            t0 = time.time(); float(run(jnp.int32(1), boxes)); t1 = time.time() - t0
            iters = 10
            t0 = time.time(); float(run(jnp.int32(1 + iters), boxes)); tm = time.time() - t0
            ms = 1000.0 * max(tm - t1, 0.0) / iters
            print(f"{mode:11s} tile={tile:5d}  {ms:8.2f} ms/batch32", flush=True)


if __name__ == "__main__":
    main()
