"""End-to-end headline throughput across the serving-config flag matrix.

Round-3 shipped five perf-affecting serving changes without end-to-end TPU
numbers and the official bench regressed 208.8 -> 168.5 img/s (VERDICT.md
r3). This script is the fix-forward instrument: it measures the FULL
headline pipeline (same methodology as bench.py — loop-in-jit, delta of
1-vs-N iterations to cancel relay dispatch/readback) for each named flag
combination SEQUENTIALLY in one process, and appends one JSON line per
entry to a results file. No flag defaults on without a row from this
script recorded in CLAUDE.md.

Usage (TPU):
    python benchmarks/bench_matrix.py --entries r3_default,no_dot,...
    python benchmarks/bench_matrix.py            # full default matrix

The pipeline measured ≙ the reference inference driver
(/root/reference/MaskRCNN/inference.py:36-254).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> DetectorConfig overrides. per_channel_acts selects the quant
# artifact (the quant-collection shapes differ); everything else reuses it.
MATRIX = {
    # reproduce the r3 official bench (all five r3 changes on)
    "r3_default": dict(per_channel_acts=True, int8_pooled=True,
                       int8_dot_lowering=True),
    # single flips off the r3 default
    "no_dot": dict(per_channel_acts=True, int8_pooled=True,
                   int8_dot_lowering=False),
    "no_pooled": dict(per_channel_acts=True, int8_pooled=False,
                      int8_dot_lowering=True),
    "no_pc": dict(per_channel_acts=False, int8_pooled=True,
                  int8_dot_lowering=True),
    # closest gated approximation of the r2 recipe (459.7 ms/batch): all
    # three gated r3 changes off. The align-kernel rewrites (one-slice,
    # sentinel skip) and decode-all proposals are NOT gated — if this entry
    # doesn't reproduce ~460, they are implicated.
    "r2ish": dict(per_channel_acts=False, int8_pooled=False,
                  int8_dot_lowering=False),
    # r2ish with the Pallas align kernel off entirely (XLA gather align):
    # bounds the align kernel family's contribution.
    "r2ish_align_xla": dict(per_channel_acts=False, int8_pooled=False,
                            int8_dot_lowering=False, pallas_roi_align="off"),
    # single flip: decode-all-anchors proposals back to gather-then-decode
    "no_decode_all": dict(per_channel_acts=True, int8_pooled=True,
                          int8_dot_lowering=True, proposal_decode_all=False),
    # full r2 recipe over gated flags (r2ish + r2 proposal formulation)
    "r2ish_prop": dict(per_channel_acts=False, int8_pooled=False,
                       int8_dot_lowering=False, proposal_decode_all=False),
    # isolate each flag against the r2ish base (r4): per-channel alone /
    # pooled alone / dot alone, and decode-all flipped on the no_dot combo.
    "pc_only": dict(per_channel_acts=True, int8_pooled=False,
                    int8_dot_lowering=False),
    "pooled_only": dict(per_channel_acts=False, int8_pooled=True,
                        int8_dot_lowering=False),
    "dot_only": dict(per_channel_acts=False, int8_pooled=False,
                     int8_dot_lowering=True),
    "no_dot_no_decode_all": dict(per_channel_acts=True, int8_pooled=True,
                                 int8_dot_lowering=False,
                                 proposal_decode_all=False),
    # r4: int8 ROIAlign inputs (the RPN's quantized P-levels feed the align
    # kernel — halves patch-DMA bytes) on the current default combo
    "int8_align_in": dict(per_channel_acts=True, int8_pooled=True,
                          int8_dot_lowering=False, int8_align_inputs=True),
    # and without per-channel (scalar in_scale fold)
    "int8_align_in_no_pc": dict(per_channel_acts=False, int8_pooled=True,
                                int8_dot_lowering=False,
                                int8_align_inputs=True),
    # r4: bf16 stem (cfg.int8_stem=False) on the current default combo —
    # the int8 stem's int32 output + unfused dequant is ~13 GB/b96 of HBM
    # traffic for MXU-starved (cin=3) compute
    "bf16_stem": dict(per_channel_acts=True, int8_pooled=True,
                      int8_dot_lowering=False, int8_stem=False),
    # r5: explicit same-process reference at the SHIPPED default combo
    # (pc + pooled + no-dot + int8_align_inputs + bf16 stem are all config
    # defaults now — only per_channel_acts needs naming)
    "r5_default": dict(per_channel_acts=True),
    # r5: bf16-served backbone stages (config.bf16_stages — the stem
    # pattern per stage; VERDICT r4 #5's counterfactual). Stage 2 pays 2.0x
    # memF from 64-lane int8 padding + unfused requant passes; stage 3 is
    # the next candidate (1.7x).
    "bf16_s2": dict(per_channel_acts=True, bf16_stages=(2,)),
    "bf16_s23": dict(per_channel_acts=True, bf16_stages=(2, 3)),
    # r5: multi-chunk align grid steps (config.align_step_rois — each grid
    # step covers N ROIs as N/16 chunks over the same double-buffered patch
    # store, amortizing the 5 per-step input-block copies; VERDICT r4 #4)
    "step64": dict(per_channel_acts=True, align_step_rois=64),
    "step128": dict(per_channel_acts=True, align_step_rois=128),
    "step256": dict(per_channel_acts=True, align_step_rois=256),
    # r5: skip all-sentinel K-ROI chunks in the align kernel (zero-padding
    # tails — ~58% of the bench mix's rows — pay ~20 predicate evals each
    # for no work; one per-chunk flag instead; bit-identical outputs)
    "skip_chunks": dict(per_channel_acts=True, align_skip_chunks=True),
}


def build_variables(cfg, images, batch):
    """Load the persisted quant artifact for this cfg's act-quant layout,
    calibrating + saving it if absent (keyed like bench.py --quant-cache)."""
    import jax

    from objectdetection_tpu import checkpoint, detector, quant

    pc = "_pc" if cfg.per_channel_acts else ""
    cache = os.path.join(REPO, "artifacts", f"quant_resnet101_1024{pc}.ckpt")
    if os.path.isdir(cache):
        t0 = time.time()
        try:
            variables = jax.device_put(checkpoint.load_quantized(cache))
            if "pooled_box_scale" not in variables.get("quant", {}):
                raise ValueError("stale artifact: no pooled-ROI scales")
            print(f"  artifact {cache}: {time.time()-t0:.1f}s",
                  file=sys.stderr, flush=True)
            return variables
        except Exception as e:
            print(f"  artifact load failed ({e}); recalibrating",
                  file=sys.stderr, flush=True)
    t0 = time.time()
    variables = detector.init_variables(cfg, jax.random.PRNGKey(0))
    variables = checkpoint.cast_params_for_inference(variables)
    variables = quant.calibrate_variables(
        variables, images, cfg, batch_size=max(1, batch // 16),
        percentile=90.0,
    )
    variables = quant.freeze_weights(variables)
    checkpoint.save_quantized(cache, variables, cfg)
    print(f"  calibrated+saved {cache}: {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    return variables


def measure(cfg, variables, images, windows, iters, warmup):
    """ms/batch of the full inference pipeline, relay-safe (see bench.py)."""
    import jax
    import jax.numpy as jnp

    from objectdetection_tpu import detector

    @jax.jit
    def run(variables, images, windows, n):
        def body(_, carry):
            imgs, acc = carry
            det = detector.forward_inference(
                variables, imgs, windows, cfg, with_masks=True
            )
            acc = acc + jnp.sum(det.scores)
            imgs = imgs + 1e-20 * acc
            return imgs, acc

        _, acc = jax.lax.fori_loop(0, n, body, (images, jnp.float32(0)))
        return acc

    t0 = time.time()
    float(run(variables, images, windows, jnp.int32(1)))
    compile_s = time.time() - t0
    for _ in range(warmup):
        float(run(variables, images, windows, jnp.int32(1)))
    t0 = time.time()
    float(run(variables, images, windows, jnp.int32(1)))
    t_one = time.time() - t0
    t0 = time.time()
    float(run(variables, images, windows, jnp.int32(1 + iters)))
    t_many = time.time() - t0
    ms = 1000.0 * max(t_many - t_one, 1e-9) / iters
    return ms, compile_s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--entries", default=",".join(MATRIX))
    p.add_argument(
        "--out", default=os.path.join(REPO, "benchmarks",
                                      "bench_matrix_results.jsonl")
    )
    p.add_argument("--no-xla-cache", action="store_true")
    args = p.parse_args()

    if not args.no_xla_cache:
        from objectdetection_tpu.metrics import enable_compilation_cache

        enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from objectdetection_tpu.config import COCO_CONFIG

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(args.batch, 1024, 1024, 3).astype(np.float32) * 255.0
        - 128.0
    )
    windows = jnp.tile(
        jnp.asarray([[0.0, 0.0, 1024.0, 1024.0]]), (args.batch, 1)
    )

    variables = None
    cur_pc = None
    for name in args.entries.split(","):
        overrides = MATRIX[name]
        cfg = COCO_CONFIG.replace(quantized_inference=True, **overrides)
        print(f"== {name}: {overrides}", file=sys.stderr, flush=True)
        if variables is None or cur_pc != cfg.per_channel_acts:
            variables = None
            jax.clear_caches()
            variables = build_variables(cfg, images, args.batch)
            cur_pc = cfg.per_channel_acts
        ms, compile_s = measure(
            cfg, variables, images, windows, args.iters, args.warmup
        )
        row = {
            "entry": name,
            "ms_per_batch": round(ms, 1),
            "imgs_per_sec": round(1000.0 * args.batch / ms, 1),
            "compile_s": round(compile_s, 1),
            "batch": args.batch,
            **overrides,
        }
        print(json.dumps(row), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
