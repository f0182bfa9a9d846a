"""Per-stage timing of the serving pipeline at bench configuration.

Times INCREMENTAL prefixes of the inference pipeline (extract → proposals →
box head → detection → masks), each as its own loop-in-jit program (relay
methodology: see bench.py), and reports the per-stage deltas. Uses the
persisted int8 artifact (bench.py --quant-cache) so runs start in seconds.

Each prefix consumes its full outputs via sums so XLA cannot dead-code
anything (CLAUDE.md gotcha: a sliced output lets XLA DCE whole convs).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--image-size", type=int, default=1024)
    p.add_argument("--backbone", default="resnet101")
    p.add_argument("--no-int8", dest="int8", action="store_false", default=True)
    p.add_argument("--per-channel", action="store_true")
    p.add_argument("--stages", default="")
    args = p.parse_args()

    from objectdetection_tpu import checkpoint, detector
    from objectdetection_tpu.anchors import config_anchors
    from objectdetection_tpu.config import COCO_CONFIG
    from objectdetection_tpu.geometry import norm_boxes
    from objectdetection_tpu.layers.detection import detection_layer
    from objectdetection_tpu.layers.proposals import proposal_layer

    cfg = COCO_CONFIG.replace(
        backbone=args.backbone,
        image_shape=(args.image_size, args.image_size, 3),
        image_max_dim=args.image_size,
        quantized_inference=args.int8,
        per_channel_acts=args.per_channel,
    )
    pc = "_pc" if args.per_channel else ""
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts",
        f"quant_{args.backbone}_{args.image_size}{pc}.ckpt",
    )
    if args.int8 and os.path.isdir(cache):
        variables = jax.device_put(checkpoint.load_quantized(cache))
        print(f"loaded artifact {cache}", file=sys.stderr)
    else:
        variables = detector.init_variables(cfg, jax.random.PRNGKey(0))
        variables = checkpoint.cast_params_for_inference(variables)
        if args.int8:
            from objectdetection_tpu import quant

            imgs = jnp.asarray(
                np.random.RandomState(0)
                .rand(args.batch, args.image_size, args.image_size, 3)
                .astype(np.float32) * 255.0 - 128.0
            )
            variables = quant.calibrate_variables(variables, imgs, cfg)
            variables = quant.freeze_weights(variables)

    model = detector.build_model(cfg)
    anchors = jnp.asarray(config_anchors(cfg))
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(args.batch, args.image_size, args.image_size, 3).astype(
            np.float32
        ) * 255.0 - 128.0
    )
    windows = jnp.tile(
        jnp.asarray([[0.0, 0.0, float(args.image_size)] * 1 + [float(args.image_size)]]),
        (args.batch, 1),
    )
    norm_windows = norm_boxes(windows, cfg.image_shape[:2])

    def sum_tree(t):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(t))

    def prefix(depth):
        def one(imgs):
            feats, _, probs, deltas = model.apply(
                variables, imgs, method=model.extract
            )
            if depth == 0:
                return sum_tree(feats) + sum_tree(probs) + sum_tree(deltas)
            props = proposal_layer(probs, deltas, anchors, cfg, training=False)
            if depth == 1:
                return sum_tree(feats) + sum_tree(props)
            _, cls_probs, bbox = model.apply(
                variables, feats, props, True, method=model.classify_rois
            )
            if depth == 2:
                return sum_tree(feats) + sum_tree(cls_probs) + sum_tree(bbox)
            det = detection_layer(props, cls_probs, bbox, norm_windows, cfg)
            if depth == 3:
                return sum_tree(feats) + sum_tree(det)
            masks = model.apply(
                variables, feats, det[..., :4],
                det[..., 4].astype(jnp.int32), True,
                method=model.predict_masks,
            )
            return sum_tree(det) + sum_tree(masks)

        @jax.jit
        def run(imgs, n):
            def body(_, carry):
                im, acc = carry
                s = one(im)
                return im + 1e-20 * s, acc + s

            _, acc = jax.lax.fori_loop(0, n, body, (imgs, jnp.float32(0)))
            return acc

        return run

    names = ["extract", "+proposals", "+box_head", "+detection", "+masks"]
    wanted = (
        [int(s) for s in args.stages.split(",")] if args.stages
        else range(len(names))
    )
    prev = 0.0
    for depth in wanted:
        run = prefix(depth)
        t0 = time.time()
        float(run(images, jnp.int32(1)))
        compile_s = time.time() - t0
        float(run(images, jnp.int32(1)))
        t0 = time.time()
        float(run(images, jnp.int32(1)))
        t_one = time.time() - t0
        t0 = time.time()
        float(run(images, jnp.int32(1 + args.iters)))
        t_many = time.time() - t0
        ms = 1000.0 * max(t_many - t_one, 0.0) / args.iters
        print(
            f"{names[depth]:12s} cum {ms:8.2f} ms/batch  "
            f"delta {ms - prev:8.2f} ms  (compile {compile_s:.0f}s)",
            flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()
