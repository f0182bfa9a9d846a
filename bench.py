"""Headline benchmark: Mask R-CNN ResNet-101 inference throughput.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline: the reference publishes no numbers (BASELINE.md); the bar is the
BASELINE.json north-star of 200 images/sec/chip for ResNet-101 Mask R-CNN
inference at 1024² on TPU v5e. vs_baseline = value / 200.
"""

import argparse
import json
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--backbone", default="resnet101")
    p.add_argument("--image-size", type=int, default=1024)
    p.add_argument("--no-masks", action="store_true")
    p.add_argument(
        "--int8",
        dest="int8",
        action="store_true",
        default=True,
        help="int8 PTQ inference (quant.py, DEFAULT): conv/matmul kernels "
        "on the MXU int8 path, calibrated on a random batch before timing. "
        "Measured accuracy cost with the default per-channel + percentile-90 "
        "recipe: -0.28 box / -1.4 mask mAP@0.5 pts "
        "(benchmarks/int8_accuracy.py)",
    )
    p.add_argument(
        "--no-int8", dest="int8", action="store_false",
        help="bf16 inference instead of int8 PTQ",
    )
    p.add_argument(
        "--quant-cache",
        default="auto",
        help="path of the persisted calibrated+frozen int8 artifact "
        "(checkpoint.save_quantized). 'auto' (default) keys a path under "
        "artifacts/ by backbone/size; 'off' disables caching. First run "
        "calibrates and saves; later runs load in seconds instead of "
        "re-calibrating (~9 min on the TPU relay).",
    )
    p.add_argument(
        "--pallas-align",
        choices=["all", "masks", "off"],
        default=None,
        help="override cfg.pallas_roi_align (Pallas patch-DMA ROIAlign)",
    )
    p.add_argument(
        "--s2d-stage2",
        dest="s2d_stage2",
        action="store_true",
        default=None,
        help="run ResNet stage 2 in the 2x2-blocked basis (ops/s2d.py; "
        "narrow-channel lane-padding fix)",
    )
    p.add_argument(
        "--no-s2d-stage2", dest="s2d_stage2", action="store_false",
    )
    p.add_argument(
        "--per-channel",
        dest="per_channel",
        action="store_true",
        default=True,
        help="per-input-channel activation quantization (DEFAULT — the "
        "measured-best recipe, -0.28/-1.4 mAP@0.5 vs -4.4/-5.3 per-tensor; "
        "cfg.per_channel_acts folds into frozen kernels at serve time)",
    )
    p.add_argument(
        "--no-per-channel", dest="per_channel", action="store_false",
    )
    p.add_argument(
        "--approx-topk",
        dest="approx_topk",
        action="store_true",
        default=None,
        help="approx_max_k proposal pre-NMS selection at recall_target 0.9 "
        "(measured recall of the true top-1000: 0.994; post-NMS top-100 "
        "match 1.0000; benchmarks/approx_topk_recall.py gates accuracy)",
    )
    p.add_argument(
        "--no-approx-topk", dest="approx_topk", action="store_false",
    )
    p.add_argument(
        "--fused-bottleneck",
        dest="fused_bottleneck",
        action="store_true",
        default=None,
        help="run int8 identity bottleneck blocks as one Pallas kernel "
        "each (ops/fused_block.py)",
    )
    p.add_argument(
        "--no-fused-bottleneck", dest="fused_bottleneck",
        action="store_false",
    )
    p.add_argument(
        "--int8-align-inputs", dest="int8_align_inputs", default=None,
        action="store_true",
        help="feed the align kernel the RPN's int8 P-levels "
        "(cfg.int8_align_inputs — half the patch-DMA bytes)",
    )
    p.add_argument(
        "--no-int8-align-inputs", dest="int8_align_inputs",
        action="store_false",
    )
    p.add_argument(
        "--int8-stem", dest="int8_stem", default=None,
        action="store_true",
        help="int8 conv1 (cfg.int8_stem; the int32 output + unfused "
        "dequant cost ~13 GB/b96 of HBM traffic)",
    )
    p.add_argument(
        "--no-int8-stem", dest="int8_stem", action="store_false",
        help="bf16 conv1 with the dequantized int8 kernel",
    )
    p.add_argument(
        "--realistic",
        action="store_true",
        help="temper the RPN box-delta weights (x0.02) so proposal "
        "statistics resemble a trained model (boxes near anchors, the full "
        "32..512px size/aspect mix) instead of the degenerate random-init "
        "mix (~60%% exactly-flat window-edge boxes). Uses its own quant "
        "artifact (suffix _rl).",
    )
    p.add_argument(
        "--no-xla-cache", action="store_true",
        help="disable the persistent XLA compilation cache "
        "(artifacts/xla_cache)",
    )
    args = p.parse_args()

    import os

    import jax

    if not args.no_xla_cache:
        from objectdetection_tpu.metrics import enable_compilation_cache

        enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from objectdetection_tpu.config import COCO_CONFIG
    from objectdetection_tpu import detector

    cfg = COCO_CONFIG.replace(
        backbone=args.backbone,
        image_shape=(args.image_size, args.image_size, 3),
        image_max_dim=args.image_size,
        quantized_inference=args.int8,
    )
    if args.pallas_align is not None:
        cfg = cfg.replace(pallas_roi_align=args.pallas_align)
    if args.s2d_stage2 is not None:
        cfg = cfg.replace(s2d_stage2=args.s2d_stage2)
    if args.approx_topk is not None:
        cfg = cfg.replace(use_approx_topk=args.approx_topk)
    if args.per_channel is not None:
        cfg = cfg.replace(per_channel_acts=args.per_channel)
    if args.fused_bottleneck is not None:
        cfg = cfg.replace(fused_bottleneck=args.fused_bottleneck)
    if args.int8_align_inputs is not None:
        cfg = cfg.replace(int8_align_inputs=args.int8_align_inputs)
    if args.int8_stem is not None:
        cfg = cfg.replace(int8_stem=args.int8_stem)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    variables = detector.init_variables(cfg, jax.random.PRNGKey(0))
    if args.realistic:
        # trained-model-like proposal statistics: near-zero box deltas keep
        # decoded proposals at their anchors (the real 32..512px size/aspect
        # mix) instead of exploding off-window and clipping to flat edge
        # slivers (601/1000 of random-init proposals; commit b4b0e79)
        import flax

        flat = flax.traverse_util.flatten_dict(variables["params"])
        for path in list(flat):
            if "rpn_bbox_pred" in path and path[-1] == "kernel":
                flat[path] = flat[path] * 0.02
        variables = dict(variables)
        variables["params"] = flax.traverse_util.unflatten_dict(flat)
    # cast weights to the compute dtype once (saves ~260MB fp32 re-reads/call)
    from objectdetection_tpu.checkpoint import cast_params_for_inference

    variables = cast_params_for_inference(variables)

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(args.batch, args.image_size, args.image_size, 3).astype(np.float32)
        * 255.0
        - 128.0
    )
    windows = jnp.tile(
        jnp.asarray(
            [[0.0, 0.0, float(args.image_size), float(args.image_size)]]
        ),
        (args.batch, 1),
    )

    if args.int8:
        from objectdetection_tpu import checkpoint, quant

        cache = args.quant_cache
        if cache == "auto":
            pc = "_pc" if cfg.per_channel_acts else ""
            rl = "_rl" if args.realistic else ""
            cache = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "artifacts",
                f"quant_{args.backbone}_{args.image_size}{pc}{rl}.ckpt",
            )
        loaded = False
        if cache != "off" and os.path.isdir(cache):
            t0 = time.time()
            try:
                variables = jax.device_put(checkpoint.load_quantized(cache))
                if "pooled_box_scale" not in variables.get("quant", {}):
                    # pre-int8_pooled artifact: loads fine but would fail
                    # at apply time (missing quant variables)
                    raise ValueError("stale artifact: no pooled-ROI scales")
                loaded = True
                print(
                    f"int8 artifact loaded from {cache}: "
                    f"{time.time() - t0:.1f}s",
                    file=sys.stderr,
                )
            except Exception as e:  # stale/mismatched artifact → recalibrate
                print(f"quant cache load failed ({e}); recalibrating",
                      file=sys.stderr)
        if not loaded:
            t0 = time.time()
            # the measured-best recipe (CLAUDE.md int8 table): per-channel
            # acts (cfg default here) + percentile-90 over 16 chunks
            variables = quant.calibrate_variables(
                variables, images, cfg,
                batch_size=max(1, args.batch // 16), percentile=90.0,
            )
            variables = quant.freeze_weights(variables)
            print(
                f"int8 calibration+freeze: {time.time() - t0:.1f}s",
                file=sys.stderr,
            )
            if cache != "off":
                checkpoint.save_quantized(cache, variables, cfg)
                print(f"int8 artifact saved to {cache}", file=sys.stderr)

    # Timing methodology: this box reaches the TPU through a relay where
    # block_until_ready is a no-op and every dispatch costs ~40 ms, so we
    # run the iteration loop ON DEVICE (fori_loop with a data dependency
    # threaded through) and force sync with a scalar readback. Per-iter time
    # = (t(iters) - t(1)) / (iters - 1), which cancels dispatch + readback.
    @jax.jit
    def run(variables, images, windows, n):
        def body(_, carry):
            imgs, acc = carry
            det = detector.forward_inference(
                variables, imgs, windows, cfg, with_masks=not args.no_masks
            )
            acc = acc + jnp.sum(det.scores)
            # fold outputs back into inputs so iterations can't be collapsed
            imgs = imgs + 1e-20 * acc
            return imgs, acc

        _, acc = jax.lax.fori_loop(0, n, body, (images, jnp.float32(0)))
        return acc

    # Force the input transfer + any pending host->device work to complete
    # BEFORE timing compile, so "compile+first run" isn't polluted by the
    # ~1.2 GB image upload over the relay (matters when diagnosing the
    # persistent-cache hit: VERDICT r3 #8).
    t0 = time.time()
    float(jnp.sum(images) + jnp.sum(windows))
    print(f"input transfer+sync: {time.time() - t0:.1f}s", file=sys.stderr)

    # Split cold-start into trace / compile / first-execute so a warm
    # persistent-cache run attributes its time honestly (VERDICT r3 #8:
    # the earlier combined number couldn't distinguish a cache hit whose
    # cost is relay program-load from a silent cache miss).
    t0 = time.time()
    lowered = run.lower(variables, images, windows, jnp.int32(1))
    print(f"trace+lower: {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    print(
        f"compile (persistent-cache hit if small): {t_compile:.1f}s",
        file=sys.stderr,
    )
    try:
        ma = compiled.memory_analysis()
        print(
            "program: "
            f"code {ma.generated_code_size_in_bytes / 1e6:.0f}MB, "
            f"argument {ma.argument_size_in_bytes / 1e9:.2f}GB, "
            f"temp {ma.temp_size_in_bytes / 1e9:.2f}GB",
            file=sys.stderr,
        )
    except Exception:
        pass

    t0 = time.time()
    float(compiled(variables, images, windows, jnp.int32(1)))
    print(
        f"first run (program load+dispatch+exec): {time.time() - t0:.1f}s",
        file=sys.stderr,
    )

    for _ in range(args.warmup):
        float(compiled(variables, images, windows, jnp.int32(1)))

    t0 = time.time()
    float(compiled(variables, images, windows, jnp.int32(1)))
    t_one = time.time() - t0

    t0 = time.time()
    float(compiled(variables, images, windows, jnp.int32(1 + args.iters)))
    t_many = time.time() - t0

    dt = max(t_many - t_one, 1e-9)
    imgs_per_sec = args.batch * args.iters / dt
    print(
        f"{args.iters} iters of batch {args.batch}: {dt:.3f}s "
        f"({1000 * dt / args.iters:.1f} ms/batch)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "maskrcnn_r101_1024_infer_throughput",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / 200.0, 3),
                "config": ("int8_ptq" if args.int8 else "bf16")
                + ("_pc" if (args.int8 and cfg.per_channel_acts) else "")
                + ("_realistic" if args.realistic else "")
                + f"_b{args.batch}",
            }
        )
    )


if __name__ == "__main__":
    main()
