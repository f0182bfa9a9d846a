"""Int8 PTQ accuracy validation: float vs int8 mAP on a trained shapes model.

Loads an orbax checkpoint produced by `odtpu train --ckpt DIR --masks`,
calibrates + freezes the int8 path on a calibration batch, and reports held-out
box/mask mAP@0.5 for the float and quantized inference paths side by side.

Usage:
    odtpu train --steps 3000 --batch 8 --masks --lr 0.003 \
        --lr-schedule warmup_cosine --ckpt /tmp/shapes_ckpt
    python benchmarks/int8_accuracy.py --ckpt /tmp/shapes_ckpt
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    p.add_argument("--images", type=int, default=64, help="held-out eval images")
    p.add_argument("--calib-images", type=int, default=16)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--score-threshold", type=float, default=0.5)
    p.add_argument(
        "--percentile", type=float, default=None,
        help="robust per-chunk-absmax percentile calibration (e.g. 90)",
    )
    p.add_argument(
        "--per-channel", action="store_true",
        help="per-input-channel activation quantization "
        "(cfg.per_channel_acts) on the backbone/FPN/RPN",
    )
    p.add_argument(
        "--float-rpn", action="store_true",
        help="keep the RPN head in float (cfg.quantize_rpn=False)",
    )
    p.add_argument(
        "--float-box-head", action="store_true",
        help="keep the box/class head in float (cfg.quantize_box_head=False)",
    )
    p.add_argument(
        "--float-mask-head", action="store_true",
        help="keep the mask head in float (cfg.quantize_mask_head=False)",
    )
    p.add_argument(
        "--float-p2", action="store_true",
        help="keep the finest FPN level in float (cfg.quantize_fpn_p2=False)",
    )
    p.add_argument(
        "--bias-corr", action="store_true",
        help="PTQ bias correction: fold E[weight-quant error * x] into "
        "the conv biases after freezing (quant.apply_bias_correction)",
    )
    p.add_argument(
        "--int8-stem", action="store_true",
        help="serve conv1 int8 (cfg.int8_stem=True — the pre-r4 default; "
        "the config default is now the bf16 stem)",
    )
    p.add_argument(
        "--bf16-stages", default="",
        help="comma list of ResNet stages served bf16 with dequantized "
        "int8 kernels (cfg.bf16_stages), e.g. '2' or '2,3'",
    )
    p.add_argument(
        "--no-int8-pooled", dest="int8_pooled", action="store_false",
        default=True,
        help="disable cfg.int8_pooled (int8 pooled ROI features into the "
        "box head — on by default since r3/r4)",
    )
    p.add_argument(
        "--no-int8-align-inputs", dest="int8_align_inputs",
        action="store_false", default=True,
        help="disable cfg.int8_align_inputs (Pallas align reads the RPN's "
        "int8 P-levels — on by default since r4)",
    )
    p.add_argument(
        "--approx-topk", action="store_true",
        help="use approx_max_k proposal selection in BOTH evals (isolates "
        "its accuracy cost on the trained model)",
    )
    # must match the `odtpu train` invocation that produced the checkpoint
    # (the optimizer-state structure depends on these)
    p.add_argument("--train-steps", type=int, default=3000)
    p.add_argument("--lr", type=float, default=0.003)
    p.add_argument("--lr-schedule", default="warmup_cosine")
    p.add_argument("--post-nms", type=int, default=256)
    args = p.parse_args()

    from objectdetection_tpu import checkpoint, detector, quant
    from objectdetection_tpu.cli import evaluate_on_shapes
    from objectdetection_tpu.config import SHAPES_CONFIG
    from objectdetection_tpu.data.shapes import ShapesDataset

    cfg = SHAPES_CONFIG.replace(
        post_nms_rois_training=args.post_nms,
        post_nms_rois_inference=min(
            SHAPES_CONFIG.post_nms_rois_inference, args.post_nms
        ),
        pre_nms_rois_count=min(
            SHAPES_CONFIG.pre_nms_rois_count, 8 * args.post_nms
        ),
        learning_rate=args.lr,
        lr_schedule=args.lr_schedule,
        warmup_steps=max(args.train_steps // 20, 10),
        total_train_steps=args.train_steps,
    )
    if args.approx_topk:
        cfg = cfg.replace(use_approx_topk=True)
    state = detector.create_train_state(cfg, jax.random.PRNGKey(0))
    state = checkpoint.load_checkpoint(args.ckpt, state)
    print(f"restored step {int(state.step)}", file=sys.stderr)
    float_vars = {"params": state.params, "batch_stats": state.batch_stats}

    ds = ShapesDataset(args.images, 128, 128, seed=args.seed + 1000)
    calib_ds = ShapesDataset(args.calib_images, 128, 128, seed=args.seed + 2000)
    eval_ids = list(range(args.images))

    # --- float eval ---
    res_f = evaluate_on_shapes(
        float_vars, cfg, ds, eval_ids,
        score_threshold=args.score_threshold, with_masks=True,
    )

    # --- calibrate + freeze + int8 eval ---
    cfg_q = cfg.replace(
        quantized_inference=True,
        quantize_rpn=not args.float_rpn,
        quantize_box_head=not args.float_box_head,
        quantize_mask_head=not args.float_mask_head,
        quantize_fpn_p2=not args.float_p2,
        per_channel_acts=args.per_channel,
        int8_stem=args.int8_stem,
        int8_pooled=args.int8_pooled,
        int8_align_inputs=args.int8_align_inputs,
        bf16_stages=tuple(
            int(s) for s in args.bf16_stages.split(",") if s
        ),
    )
    # init with the quantized model to get the quant collection skeleton,
    # then graft the trained float params/batch_stats on top
    qskel = detector.init_variables(cfg_q, jax.random.PRNGKey(0))
    calib = calib_ds.load_batch(list(range(args.calib_images)), cfg_q)
    qvars = quant.calibrate_variables(
        {**float_vars, "quant": qskel["quant"]},
        jnp.asarray(calib.images), cfg_q,
        batch_size=4,
        percentile=args.percentile,
    )
    if args.bias_corr:
        means = quant.record_act_means(
            qvars, jnp.asarray(calib.images), cfg_q, batch_size=4
        )
        frozen = quant.freeze_weights(qvars)
        qvars = quant.apply_bias_correction(frozen, qvars, means)
    else:
        qvars = quant.freeze_weights(qvars)
    res_q = evaluate_on_shapes(
        qvars, cfg_q, ds, eval_ids,
        score_threshold=args.score_threshold, with_masks=True,
    )

    out = {
        "float": {"box_mAP@0.5": res_f["mAP"], "mask_mAP@0.5": res_f["mask_mAP"]},
        "int8": {"box_mAP@0.5": res_q["mAP"], "mask_mAP@0.5": res_q["mask_mAP"]},
        "delta": {
            "box": res_q["mAP"] - res_f["mAP"],
            "mask": res_q["mask_mAP"] - res_f["mask_mAP"],
        },
    }
    print(json.dumps(out, indent=2, default=float))


if __name__ == "__main__":
    main()
