"""Per-stage R101 bottom-up timing: where do the backbone's ms go?

Times stem / stage2 / stage3 / stage4 / stage5 chains separately in bf16 and
int8 at the given batch, against their int8 MXU-roofline estimates, to scope
a fused Pallas bottleneck-block kernel.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_tpu.models.backbone import (
    BottleneckBlock,
    FrozenBatchNorm,
    RESNET_STAGE4_BLOCKS,
    Stage1Conv,
)
from objectdetection_tpu import quant

INT8_TOPS = 394e12
BF16_FLOPS = 197e12


def timed(fn, args, iters, label, gmacs):
    float(fn(jnp.int32(1), *args))
    float(fn(jnp.int32(1), *args))
    t0 = time.time(); float(fn(jnp.int32(1), *args)); t1 = time.time() - t0
    t0 = time.time(); float(fn(jnp.int32(1 + iters), *args)); tm = time.time() - t0
    ms = 1000.0 * max(tm - t1, 0.0) / iters
    tops = 2 * gmacs / (ms / 1e3) / 1e3 if ms > 0 else 0.0
    roof_ms = 2 * gmacs * 1e9 / INT8_TOPS * 1e3
    print(f"{label:28s} {ms:8.2f} ms  ({tops:6.1f} TOP/s, "
          f"int8 roofline {roof_ms:5.2f} ms)", flush=True)
    return ms


def make_stage(filters, num_blocks, first_stride, stage_idx, quantized):
    import flax.linen as nn

    class Stage(nn.Module):
        @nn.compact
        def __call__(self, x):
            dt = jnp.bfloat16
            x = BottleneckBlock(
                filters=filters, stride=first_stride, projection=True,
                stage=stage_idx, block="a", dtype=dt, quantized=quantized,
                name=f"res{stage_idx}a",
            )(x)
            for i in range(1, num_blocks):
                blk = chr(ord("a") + i)
                x = BottleneckBlock(
                    filters=filters, stage=stage_idx, block=blk, dtype=dt,
                    quantized=quantized, name=f"res{stage_idx}{blk}",
                )(x)
            return x

    return Stage()


def stage_gmacs(batch, hw, cin, filters, num_blocks, stride):
    f1, f2, f3 = filters
    out_hw = hw // stride
    per_px_a = cin * f1 + 9 * f1 * f2 + f2 * f3 + cin * f3  # block a + proj
    per_px = f3 * f1 + 9 * f1 * f2 + f2 * f3
    return batch * out_hw * out_hw * (
        per_px_a + (num_blocks - 1) * per_px
    ) / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    b = args.batch
    print(f"devices: {jax.devices()}  batch={b}", file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)

    stages = [
        # (name, in_hw, cin, filters, blocks, first_stride)
        ("stage2 256² 3blk", 256, 64, (64, 64, 256), 3, 1),
        ("stage3 128² 4blk", 256, 256, (128, 128, 512), 4, 2),
        ("stage4 64² 23blk", 128, 512, (256, 256, 1024), RESNET_STAGE4_BLOCKS["resnet101"], 2),
        ("stage5 32² 3blk", 64, 1024, (512, 512, 2048), 3, 2),
    ]

    for quantized in (False, True):
        print(f"--- quantized={quantized} ---", flush=True)
        for name, hw, cin, filters, blocks, stride in stages:
            mod = make_stage(filters, blocks, stride, int(name[5]), quantized)
            x = jax.jit(
                lambda k: jax.random.normal(k, (b, hw, hw, cin), jnp.float32)
                .astype(jnp.bfloat16)
            )(jax.random.fold_in(key, hw * cin))
            variables = mod.init(jax.random.PRNGKey(0), x)
            if quantized:
                # calibrate then freeze
                _, m = mod.apply(variables, x, mutable=["quant"])
                variables = {**variables, "quant": m["quant"]}
                variables = quant.freeze_weights(variables)

            if quantized:
                # inference stream expects (int8, scale) pairs
                sx = jnp.max(jnp.abs(x.astype(jnp.float32)))

                @jax.jit
                def run(n, variables, x, sx=sx):
                    x8 = quant.quantize_act(x, sx)

                    def body(_, carry):
                        xc, acc = carry
                        out8, _ = mod.apply(variables, (xc, sx))
                        s = jnp.sum(out8.astype(jnp.float32))
                        return (
                            jnp.clip(
                                xc.astype(jnp.int32)
                                + (s.astype(jnp.int32) & 1),
                                -128, 127,
                            ).astype(jnp.int8),
                            acc + s,
                        )
                    return jax.lax.fori_loop(
                        0, n, body, (x8, jnp.float32(0))
                    )[1]
            else:
                @jax.jit
                def run(n, variables, x):
                    def body(_, carry):
                        xc, acc = carry
                        out = mod.apply(variables, xc)
                        s = jnp.sum(out.astype(jnp.float32))
                        return xc + (1e-20 * s).astype(xc.dtype), acc + s
                    return jax.lax.fori_loop(
                        0, n, body, (x, jnp.float32(0))
                    )[1]

            g = stage_gmacs(b, hw, cin, filters, blocks, stride)
            timed(run, (variables, x), args.iters, name, g)


if __name__ == "__main__":
    main()
