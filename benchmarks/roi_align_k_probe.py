"""Probe the Pallas box-ROIAlign cost structure at bench scale (b96, 1000
ROIs, 1024²): K_ROIS sweep × ROI size mixes.

The +box_head stage is ~132 ms/batch at b96 (benchmarks/pipeline_breakdown);
the head matmuls account for ~10-15 ms, so ~115 ms is the align itself
(~1.2 us/ROI over 96k ROIs). This isolates where that goes.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make_boxes(rng, b, r, mix):
    if mix == "huge":
        # random-weight bench regime: most proposals near full-image
        y1 = rng.rand(b, r) * 0.1
        x1 = rng.rand(b, r) * 0.1
        y2 = 0.8 + rng.rand(b, r) * 0.2
        x2 = 0.8 + rng.rand(b, r) * 0.2
    elif mix == "small":
        cy = rng.rand(b, r) * 0.8 + 0.1
        cx = rng.rand(b, r) * 0.8 + 0.1
        h = rng.rand(b, r) * 0.05 + 0.02
        w = rng.rand(b, r) * 0.05 + 0.02
        y1, x1, y2, x2 = cy - h, cx - w, cy + h, cx + w
    else:  # realistic: log-uniform sizes
        cy = rng.rand(b, r) * 0.8 + 0.1
        cx = rng.rand(b, r) * 0.8 + 0.1
        s = np.exp(rng.rand(b, r) * np.log(0.5 / 0.02) + np.log(0.02))
        a = np.exp(rng.randn(b, r) * 0.3)
        h, w = s * a / 2, s / a / 2
        y1, x1, y2, x2 = cy - h, cx - w, cy + h, cx + w
    boxes = np.stack([y1, x1, y2, x2], -1).clip(0, 1).astype(np.float32)
    return jnp.asarray(boxes)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--rois", type=int, default=1000)
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--ks", default="4,8,16")
    p.add_argument(
        "--steps", default="",
        help="comma list of step_rois values to sweep at K=16 (multi-chunk "
        "grid steps, config.align_step_rois); each is parity-checked "
        "against the one-chunk kernel on-device before timing",
    )
    p.add_argument("--mixes", default="realistic,huge")
    p.add_argument(
        "--int8-in", action="store_true",
        help="int8 features + in_scale (the cfg.int8_align_inputs path)",
    )
    args = p.parse_args()

    from objectdetection_tpu.ops.roi_align_pallas import (
        batched_multilevel_roi_align_pallas,
    )

    b, r, d = args.batch, args.rois, args.size
    c = 256
    rng = np.random.RandomState(0)
    in_scale = jnp.float32(4.0) if args.int8_in else None

    def level(s):
        arr = rng.rand(b, d // s, d // s, c).astype(np.float32)
        if args.int8_in:
            # quantize on HOST: materializing the float pyramid (8.5 GB at
            # b96) on device next to the int8 copies measured OOM
            codes = np.clip(np.rint(arr / 4.0 * 127.0), -128, 127)
            return jnp.asarray(codes.astype(np.int8))
        return jnp.asarray(arr, jnp.bfloat16)

    feats = [level(s) for s in (4, 8, 16, 32)]
    print(
        f"b={b} r={r} ({b * r} ROIs) levels "
        f"{[tuple(f.shape[1:3]) for f in feats]}",
        flush=True,
    )

    sweeps = [("K", int(x), None) for x in args.ks.split(",") if x] + [
        ("step", 16, int(x)) for x in args.steps.split(",") if x
    ]
    for mix in args.mixes.split(","):
        boxes = make_boxes(rng, b, r, mix)
        for label, k, step in sweeps:
            if step is not None:
                # on-device parity vs the one-chunk kernel (identical math
                # over the same patch store -> bit-identical outputs).
                # Small batch slice: full-scale would hold two 2.4 GB
                # pooled tensors next to the timing buffers (measured OOM).
                nb = 8

                @jax.jit
                def parity(f, bx, step=step):
                    a = batched_multilevel_roi_align_pallas(
                        f, bx, (d, d), (7, 7), k_rois=k, in_scale=in_scale
                    )
                    s = batched_multilevel_roi_align_pallas(
                        f, bx, (d, d), (7, 7), k_rois=k, step_rois=step,
                        in_scale=in_scale,
                    )
                    return jnp.sum(
                        (a.astype(jnp.float32) != s.astype(jnp.float32))
                        .astype(jnp.int32)
                    )

                mismatch = int(parity([f[:nb] for f in feats], boxes[:nb]))
                print(
                    f"mix={mix:9s} step={step}: parity "
                    f"{'EXACT' if mismatch == 0 else f'{mismatch} MISMATCHED'}",
                    flush=True,
                )

            @jax.jit
            def run(feats, boxes, n, k=k, step=step):
                def body(_, carry):
                    bx, acc = carry
                    out = batched_multilevel_roi_align_pallas(
                        feats, bx, (d, d), (7, 7), k_rois=k,
                        step_rois=step, in_scale=in_scale,
                    )
                    s = jnp.sum(out.astype(jnp.float32))
                    return bx + 1e-20 * s, acc + s

                _, acc = jax.lax.fori_loop(
                    0, n, body, (boxes, jnp.float32(0))
                )
                return acc

            float(run(feats, boxes, jnp.int32(1)))
            float(run(feats, boxes, jnp.int32(1)))
            t0 = time.time()
            float(run(feats, boxes, jnp.int32(1)))
            t1 = time.time() - t0
            t0 = time.time()
            float(run(feats, boxes, jnp.int32(1 + args.iters)))
            tm = time.time() - t0
            ms = 1000.0 * max(tm - t1, 0.0) / args.iters
            tag = f"K={k:3d}" if step is None else f"K={k} step={step:4d}"
            print(
                f"mix={mix:9s} {tag}: {ms:8.2f} ms/batch "
                f"({1000.0 * ms / (b * r):6.2f} us/ROI)",
                flush=True,
            )


if __name__ == "__main__":
    main()
