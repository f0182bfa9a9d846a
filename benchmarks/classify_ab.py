"""A/B the classify stage: XLA vs Pallas align, align-only vs align+head."""

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
from objectdetection_tpu.layers.proposals import proposal_layer
from objectdetection_tpu.ops.roi_align import batched_multilevel_roi_align
from objectdetection_tpu.ops.roi_align_pallas import (
    batched_multilevel_roi_align_pallas,
)

B = 32


def timed(fn, args, iters, label):
    float(fn(jnp.int32(1), *args))
    float(fn(jnp.int32(1), *args))
    t0 = time.time(); float(fn(jnp.int32(1), *args)); t1 = time.time() - t0
    t0 = time.time(); float(fn(jnp.int32(1 + iters), *args)); tm = time.time() - t0
    ms = 1000.0 * max(tm - t1, 0.0) / iters
    print(f"{label:40s} {ms:8.2f} ms/batch", flush=True)
    return ms


def main():
    cfg = COCO_CONFIG.replace(quantized_inference=True)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    variables = detector.init_variables(cfg, jax.random.PRNGKey(0))
    variables = cast_params_for_inference(variables)
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(B, 1024, 1024, 3).astype(np.float32) * 255.0 - 128.0
    )
    variables = quant.calibrate_variables(variables, images, cfg, batch_size=8)
    variables = quant.freeze_weights(variables)

    model = detector.build_model(cfg)
    anchors = jnp.asarray(config_anchors(cfg))

    @jax.jit
    def stage_inputs(variables, images):
        feats, _, rpn_probs, rpn_deltas = model.apply(
            variables, images, method=model.extract
        )
        props = proposal_layer(rpn_probs, rpn_deltas, anchors, cfg, training=False)
        return feats, props

    feats, props = stage_inputs(variables, images)
    jax.block_until_ready(props)
    print("inputs ready", file=sys.stderr, flush=True)

    def classify_loop(use_pallas):
        @jax.jit
        def run(n, variables, feats, props):
            def body(_, carry):
                p, acc = carry
                _, probs, bbox = model.apply(
                    variables, feats, p, use_pallas, method=model.classify_rois
                )
                acc = acc + jnp.sum(probs) + jnp.sum(bbox[..., 0])
                return p + 1e-20 * acc, acc
            return jax.lax.fori_loop(0, n, body, (props, jnp.float32(0)))[1]
        return run

    def align_loop(align):
        @jax.jit
        def run(n, feats, props):
            f4 = list(feats[:4])
            def body(_, carry):
                p, acc = carry
                out = align(f4, p, (1024, 1024), (7, 7))
                acc = acc + jnp.sum(out.astype(jnp.float32))
                return p + 1e-20 * acc, acc
            return jax.lax.fori_loop(0, n, body, (props, jnp.float32(0)))[1]
        return run

    it = 10
    timed(align_loop(batched_multilevel_roi_align), (feats, props), it,
          "align only, XLA, real proposals")
    timed(align_loop(batched_multilevel_roi_align_pallas), (feats, props), it,
          "align only, Pallas, real proposals")
    timed(classify_loop(False), (variables, feats, props), it,
          "classify (align+boxhead), XLA")
    timed(classify_loop(True), (variables, feats, props), it,
          "classify (align+boxhead), Pallas")


if __name__ == "__main__":
    main()
