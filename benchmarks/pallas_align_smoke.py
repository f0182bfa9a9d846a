"""Real-TPU smoke + parity check for the Pallas ROIAlign kernel.

Runs the kernel (float out and int8 out) against the XLA gather path on a
COCO-sized pyramid with a mixed box set (normal/tiny/huge/flat/zero rows).
Interpret mode can't catch Mosaic lowering quirks (CLAUDE.md gotchas), so
this is the first thing to run on hardware after kernel changes.

Run:  python benchmarks/pallas_align_smoke.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_tpu.ops.roi_align import batched_multilevel_roi_align
from objectdetection_tpu.ops import roi_align_pallas as rap
from objectdetection_tpu.ops.roi_align_pallas import (
    batched_multilevel_roi_align_pallas,
)

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
        [0.55, 0.0, 0.55, 1.0],  # window-edge flat sliver
        [0.1, 0.2, 0.52, 0.62],
        [0.0, 0.0, 0.0, 0.0],
    ]
    boxes = jnp.asarray(np.stack([np.asarray(boxes, np.float32)] * 2))

    b, r = boxes.shape[:2]
    heights = np.array([f.shape[1] for f in feats], np.int32)
    widths = np.array([f.shape[2] for f in feats], np.int32)
    for pool in (7, 14):
        ref = np.asarray(
            batched_multilevel_roi_align(feats, boxes, IMAGE, (pool, pool)),
            np.float32,
        )
        # Reroute-aware expectation: no_fit rows (pathological extents like
        # the window-edge sliver) DELIBERATELY sample the full top level
        # exactly instead of corner-clamping at their parity level (see
        # roi_align_pallas._route_and_meta). Expect exact XLA sampling of
        # the top map for those rows, XLA multilevel parity everywhere else.
        rm = rap._route_and_meta(
            boxes, IMAGE, heights, widths, pool, 2, b, r
        )
        no_fit = np.asarray(rm["no_fit"]).reshape(b, r)
        ref_top = np.asarray(
            batched_multilevel_roi_align(
                feats[-1:], boxes, IMAGE, (pool, pool)
            ),
            np.float32,
        )
        ref = np.where(no_fit[..., None, None, None], ref_top, ref)
        print(f"pool {pool}: no_fit rows = {int(no_fit.sum())}", flush=True)
        got = np.asarray(
            batched_multilevel_roi_align_pallas(
                feats, boxes, IMAGE, (pool, pool)
            ),
            np.float32,
        )
        err = np.max(np.abs(got - ref))
        print(f"pool {pool}: float max|pallas-xla| = {err:.5f}", flush=True)
        assert err < 0.05, "float parity failed"

        scale_map = jnp.asarray(
            rng.rand(pool, pool, C).astype(np.float32) * 5.0 + 0.1
        )
        inv = np.asarray(127.0 / scale_map)
        want = np.clip(
            np.round(
                np.asarray(
                    batched_multilevel_roi_align_pallas(
                        feats, boxes, IMAGE, (pool, pool)
                    ),
                    np.float32,
                )
                * inv[None, None]
            ),
            -128,
            127,
        ).astype(np.int8)
        got8 = np.asarray(
            batched_multilevel_roi_align_pallas(
                feats, boxes, IMAGE, (pool, pool), out_quant=scale_map
            )
        )
        bad = int((got8 != want).sum())
        print(f"pool {pool}: int8 mismatched codes = {bad}", flush=True)
        assert bad == 0, "int8 epilogue parity failed"

        # --- int8 INPUTS (cfg.int8_align_inputs): quantized pyramid in,
        # deferred-dequant epilogue; patch DMAs at 1 B/elt. Expectation is
        # the kernel's own bf16 run over the DEQUANTIZED features
        # (tolerance: bf16 blend rounding; inputs differ by quant error
        # from `feats`, so compare against deq, not feats).
        from objectdetection_tpu.quant import dequantize_act, quantize_act

        s_in = jnp.float32(4.0)
        feats8 = [quantize_act(f, s_in) for f in feats]
        deq = [dequantize_act(f8, s_in, jnp.bfloat16) for f8 in feats8]
        want_f = np.asarray(
            batched_multilevel_roi_align_pallas(
                deq, boxes, IMAGE, (pool, pool)
            ),
            np.float32,
        )
        got_f = np.asarray(
            batched_multilevel_roi_align_pallas(
                feats8, boxes, IMAGE, (pool, pool), in_scale=s_in
            ),
            np.float32,
        )
        err8 = np.max(np.abs(got_f - want_f))
        print(f"pool {pool}: int8-in float max err = {err8:.5f}", flush=True)
        assert err8 < 0.05, "int8-in parity failed"
        got88 = np.asarray(
            batched_multilevel_roi_align_pallas(
                feats8, boxes, IMAGE, (pool, pool), in_scale=s_in,
                out_quant=scale_map,
            ),
            np.int32,
        )
        want88 = np.clip(
            np.round(got_f * inv[None, None]), -128, 127
        ).astype(np.int32)
        dmax = int(np.abs(got88 - want88).max())
        print(f"pool {pool}: int8-in int8-out max code delta = {dmax}",
              flush=True)
        assert dmax <= 1, "int8-in int8-out parity failed"
    print("pallas align smoke OK", flush=True)


if __name__ == "__main__":
    main()
