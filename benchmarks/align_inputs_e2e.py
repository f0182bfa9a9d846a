"""End-to-end output-delta check for cfg.int8_align_inputs on real TPU.

The gate's kernel-level parity is tolerance-tested (pallas_align_smoke:
max float err 0.031 vs aligning the dequantized pyramid), but the flag
defaults ON for serving, so this script quantifies the DETECTION-level
effect at COCO scale: one calibrated+frozen int8 model at 1024², the same
batch run with the gate on and off, comparing scores/boxes/counts.

The int8 codes the align kernel reads are exactly the ones the RPN's
shared conv consumes — the gate adds no new quantization, it reuses an
existing one for a second consumer. Expected deltas are therefore at the
level of the pooled-feature rounding (<=1 int8 code step), far below the
per-channel PTQ recipe's measured accuracy cost (-0.28 box mAP@0.5).

Run:  python benchmarks/align_inputs_e2e.py            # TPU
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from objectdetection_tpu import detector, quant
    from objectdetection_tpu.config import COCO_CONFIG

    b = 2
    cfg_on = COCO_CONFIG.replace(
        quantized_inference=True, per_channel_acts=True,
        int8_align_inputs=True,
    )
    cfg_off = cfg_on.replace(int8_align_inputs=False)

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(
        rng.rand(b, 1024, 1024, 3).astype(np.float32) * 255.0 - 128.0
    )
    windows = jnp.tile(jnp.asarray([[0.0, 0.0, 1024.0, 1024.0]]), (b, 1))

    variables = detector.init_variables(cfg_on, jax.random.PRNGKey(0))
    # trained-model-like proposal statistics (bench.py --realistic)
    import flax

    flat = flax.traverse_util.flatten_dict(variables["params"])
    for path in list(flat):
        if "rpn_bbox_pred" in path and path[-1] == "kernel":
            flat[path] = flat[path] * 0.02
    variables = dict(variables)
    variables["params"] = flax.traverse_util.unflatten_dict(flat)

    t0 = time.time()
    variables = quant.calibrate_variables(
        variables, imgs, cfg_on, batch_size=b, percentile=90.0
    )
    variables = quant.freeze_weights(variables)
    print(f"calibrate+freeze: {time.time() - t0:.1f}s", file=sys.stderr)

    dets = {}
    for name, cfg in (("on", cfg_on), ("off", cfg_off)):
        t0 = time.time()
        det = jax.jit(
            lambda v, i, w, cfg=cfg: detector.forward_inference(
                v, i, w, cfg
            )
        )(variables, imgs, windows)
        det = jax.tree_util.tree_map(np.asarray, det)
        print(f"infer gate={name}: {time.time() - t0:.1f}s", file=sys.stderr)
        dets[name] = det

    on, off = dets["on"], dets["off"]
    n_on, n_off = int(on.valid.sum()), int(off.valid.sum())
    both = (np.asarray(on.valid) & np.asarray(off.valid)).astype(bool)
    ds = np.abs(on.scores - off.scores)[both]
    db = np.abs(on.boxes - off.boxes)[both]  # pixels at 1024²
    same_cls = (on.class_ids == off.class_ids)[both]
    print(
        f"valid: on={n_on} off={n_off} | matched rows: {int(both.sum())}\n"
        f"max |dscore| = {float(ds.max() if ds.size else 0):.5f}  "
        f"mean = {float(ds.mean() if ds.size else 0):.6f}\n"
        f"max |dbox| (norm) = {float(db.max() if db.size else 0):.3f}  "
        f"mean = {float(db.mean() if db.size else 0):.4f}\n"
        f"class agreement = {float(same_cls.mean() if same_cls.size else 1):.4f}",
        flush=True,
    )
    assert abs(n_on - n_off) <= max(2, n_on // 20), (n_on, n_off)
    print("align_inputs e2e OK", flush=True)


if __name__ == "__main__":
    main()
