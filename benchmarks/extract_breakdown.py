"""Split the `extract` stage cost: ResNet bottom-up vs +FPN vs +RPN.

pipeline_breakdown measured extract = 295 ms/batch96 int8 (52% of the
serving pipeline); this isolates where inside. Uses freshly-initialized
frozen-int8 variables with unit quant scales — weight values don't change
conv timing, so no calibration needed.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def ones_scales(variables):
    """Set all scalar quant scales to 1 (enough for timing; zero scales
    would still run the same convs but propagate zeros)."""
    import jax as _jax

    q = _jax.tree.map(
        lambda x: jnp.ones_like(x) if x.ndim == 0 else x, variables["quant"]
    )
    return {**variables, "quant": q}


def timed(run, args_, iters, label):
    float(run(jnp.int32(1), *args_))
    float(run(jnp.int32(1), *args_))
    t0 = time.time(); float(run(jnp.int32(1), *args_)); t1 = time.time() - t0
    t0 = time.time(); float(run(jnp.int32(1 + iters), *args_)); tm = time.time() - t0
    ms = 1000.0 * max(tm - t1, 0.0) / iters
    print(f"{label:36s} {ms:8.2f} ms/batch", flush=True)
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--no-int8", dest="int8", action="store_false", default=True)
    args = p.parse_args()

    from objectdetection_tpu import quant
    from objectdetection_tpu.config import COCO_CONFIG
    from objectdetection_tpu.models.backbone import ResNetBottomUp, ResNetFPN
    from objectdetection_tpu.models.rpn import RPNHead

    cfg = COCO_CONFIG.replace(
        image_shape=(args.size, args.size, 3),
        quantized_inference=args.int8,
    )
    dt = jnp.bfloat16
    b = args.batch
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(b, args.size, args.size, 3).astype(np.float32) * 255 - 128
    )

    def prep(module, sample_args):
        variables = module.init(jax.random.PRNGKey(0), *sample_args)
        variables = jax.device_put(variables)
        if args.int8:
            variables = ones_scales(variables)
            variables = quant.freeze_weights(variables)
        return variables

    def loop(fn):
        @jax.jit
        def run(n, x0, v):
            def body(_, carry):
                x, acc = carry
                out = fn(v, x)
                s = sum(
                    jnp.sum(t.astype(jnp.float32))
                    for t in jax.tree.leaves(out)
                )
                return x + 1e-20 * s, acc + s

            _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0)))
            return acc

        return run

    # 1. bottom-up only
    bu = ResNetBottomUp(
        model=cfg.backbone, dtype=dt, quantized=args.int8, name="resnet"
    )
    v_bu = prep(bu, (jnp.zeros((1, args.size, args.size, 3), dt),))
    timed(
        loop(lambda v, x: bu.apply(v, x)), (images, v_bu), args.iters,
        "bottom-up C2-C5",
    )

    # 2. full backbone (bottom-up + FPN)
    fpn = ResNetFPN(
        model=cfg.backbone, dtype=dt, quantized=args.int8, name="fpn"
    )
    v_fpn = prep(fpn, (jnp.zeros((1, args.size, args.size, 3), dt),))
    timed(
        loop(lambda v, x: fpn.apply(v, x)), (images, v_fpn), args.iters,
        "bottom-up + FPN P2-P6",
    )

    # 3. RPN alone on fixed pyramid inputs
    feats = [
        jnp.asarray(
            rng.rand(b, args.size // s, args.size // s, 256).astype(
                np.float32
            ),
            dt,
        )
        for s in (4, 8, 16, 32, 64)
    ]
    rpn = RPNHead(
        anchors_per_location=3, quantized=args.int8, dtype=dt, name="rpn"
    )
    v_rpn = prep(rpn, (tuple(f[:1] for f in feats),))

    @jax.jit
    def run_rpn(n, f0, v):
        def body(_, carry):
            f, acc = carry
            out = rpn.apply(v, tuple(f))
            s = sum(
                jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(out)
            )
            return [x + (1e-20 * s).astype(x.dtype) for x in f], acc + s

        _, acc = jax.lax.fori_loop(0, n, body, (list(f0), jnp.float32(0)))
        return acc

    float(run_rpn(jnp.int32(1), feats, v_rpn))
    float(run_rpn(jnp.int32(1), feats, v_rpn))
    t0 = time.time(); float(run_rpn(jnp.int32(1), feats, v_rpn)); t1 = time.time() - t0
    t0 = time.time(); float(run_rpn(jnp.int32(1 + args.iters), feats, v_rpn)); tm = time.time() - t0
    ms = 1000.0 * max(tm - t1, 0.0) / args.iters
    print(f"{'RPN on P2-P6':36s} {ms:8.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
