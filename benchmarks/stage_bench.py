"""Per-stage timing of the Mask R-CNN inference pipeline on TPU.

Times each pipeline stage (extract / proposals / classify+ROIAlign /
detection / masks) with the loop-in-jit methodology from bench.py (the TPU
relay makes per-dispatch timing useless), in bf16 or int8 (--int8) mode.

Usage:  python benchmarks/stage_bench.py [--batch 32] [--int8] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_tpu.anchors import config_anchors
from objectdetection_tpu.checkpoint import cast_params_for_inference
from objectdetection_tpu.config import COCO_CONFIG
from objectdetection_tpu import detector, quant
from objectdetection_tpu.geometry import norm_boxes
from objectdetection_tpu.layers.detection import detection_layer
from objectdetection_tpu.layers.proposals import proposal_layer


def timed(jit_fn, args, iters, label):
    """(t(1+iters) - t(1)) / iters with a warmup; prints and returns ms."""
    float(jit_fn(jnp.int32(1), *args))  # compile
    float(jit_fn(jnp.int32(1), *args))  # warm
    t0 = time.time()
    float(jit_fn(jnp.int32(1), *args))
    t1 = time.time() - t0
    t0 = time.time()
    float(jit_fn(jnp.int32(1 + iters), *args))
    tm = time.time() - t0
    ms = 1000.0 * max(tm - t1, 0.0) / iters
    print(f"{label:34s} {ms:8.2f} ms/batch", flush=True)
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--image-size", type=int, default=1024)
    args = p.parse_args()

    cfg = COCO_CONFIG.replace(
        image_shape=(args.image_size, args.image_size, 3),
        image_max_dim=args.image_size,
        quantized_inference=args.int8,
    )
    print(f"devices: {jax.devices()}  int8={args.int8}", file=sys.stderr)

    variables = detector.init_variables(cfg, jax.random.PRNGKey(0))
    variables = cast_params_for_inference(variables)
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(args.batch, args.image_size, args.image_size, 3).astype(np.float32)
        * 255.0 - 128.0
    )
    s = float(args.image_size)
    windows = jnp.tile(jnp.asarray([[0.0, 0.0, s, s]]), (args.batch, 1))
    if args.int8:
        t0 = time.time()
        variables = quant.calibrate_variables(variables, images, cfg)
        variables = quant.freeze_weights(variables)
        print(f"calibrate+freeze: {time.time() - t0:.1f}s", file=sys.stderr)

    model = detector.build_model(cfg)
    anchors = jnp.asarray(config_anchors(cfg))
    norm_windows = norm_boxes(windows, cfg.image_shape[:2])

    # ---- stage inputs (computed once) ----
    @jax.jit
    def stage_inputs(variables, images):
        feats, _, rpn_probs, rpn_deltas = model.apply(
            variables, images, method=model.extract
        )
        proposals = proposal_layer(rpn_probs, rpn_deltas, anchors, cfg, training=False)
        _, cls_probs, bbox = model.apply(
            variables, feats, proposals, method=model.classify_rois
        )
        det = detection_layer(proposals, cls_probs, bbox, norm_windows, cfg)
        return feats, rpn_probs, rpn_deltas, proposals, cls_probs, bbox, det

    t0 = time.time()
    feats, rpn_probs, rpn_deltas, proposals, cls_probs, bbox, det = jax.tree.map(
        lambda x: x, stage_inputs(variables, images)
    )
    jax.block_until_ready(det)
    print(f"stage inputs ready: {time.time() - t0:.1f}s", file=sys.stderr)

    # ---- per-stage loops (data dependency threaded through a perturbation) ----
    @jax.jit
    def run_extract(n, variables, images):
        def body(_, carry):
            imgs, acc = carry
            feats, _, probs, _ = model.apply(variables, imgs, method=model.extract)
            acc = acc + jnp.sum(probs[..., 0])
            return imgs + 1e-20 * acc, acc
        return jax.lax.fori_loop(0, n, body, (images, jnp.float32(0)))[1]

    @jax.jit
    def run_proposals(n, rpn_probs, rpn_deltas):
        def body(_, carry):
            probs, acc = carry
            props = proposal_layer(probs, rpn_deltas, anchors, cfg, training=False)
            acc = acc + jnp.sum(props)
            return probs + 1e-20 * acc, acc
        return jax.lax.fori_loop(0, n, body, (rpn_probs, jnp.float32(0)))[1]

    @jax.jit
    def run_classify(n, variables, feats, proposals):
        def body(_, carry):
            props, acc = carry
            _, probs, bbox = model.apply(
                variables, feats, props, True, method=model.classify_rois
            )
            acc = acc + jnp.sum(probs) + jnp.sum(bbox[..., 0])
            return props + 1e-20 * acc, acc
        return jax.lax.fori_loop(0, n, body, (proposals, jnp.float32(0)))[1]

    @jax.jit
    def run_detection(n, proposals, cls_probs, bbox):
        def body(_, carry):
            props, acc = carry
            det = detection_layer(props, cls_probs, bbox, norm_windows, cfg)
            acc = acc + jnp.sum(det)
            return props + 1e-20 * acc, acc
        return jax.lax.fori_loop(0, n, body, (proposals, jnp.float32(0)))[1]

    @jax.jit
    def run_masks(n, variables, feats, det):
        det_boxes = det[..., :4]
        cls = det[..., 4].astype(jnp.int32)
        def body(_, carry):
            boxes, acc = carry
            masks = model.apply(
                variables, feats, boxes, cls, True, method=model.predict_masks
            )
            acc = acc + jnp.sum(masks[..., 0])
            return boxes + 1e-20 * acc, acc
        return jax.lax.fori_loop(0, n, body, (det_boxes, jnp.float32(0)))[1]

    it = args.iters
    total = 0.0
    total += timed(run_extract, (variables, images), it, "extract (backbone+FPN+RPN)")
    total += timed(run_proposals, (rpn_probs, rpn_deltas), it, "proposal layer")
    total += timed(run_classify, (variables, feats, proposals), it,
                   "classify_rois (ROIAlign+boxhead)")
    total += timed(run_detection, (proposals, cls_probs, bbox), it, "detection layer")
    total += timed(run_masks, (variables, feats, det), it, "mask align+head")
    print(f"{'sum of stages':34s} {total:8.2f} ms/batch "
          f"({1000.0 * args.batch / total:.1f} img/s)")


if __name__ == "__main__":
    main()
