"""Fused Pallas identity bottleneck vs the unfused XLA int8 conv chain.

Times ONE identity block per ResNet stage shape (1024² input geometry) in
both formulations at the given batch. The unfused baseline is the exact
QuantConv/FrozenBatchNorm int8 chain the backbone runs today (frozen
weights, int8-carried stream).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_tpu.ops.fused_block import fused_identity_block_int8
from objectdetection_tpu.quant import quantize_act

STAGES = {  # stage: (H, W, C3, C1) at 1024² input
    2: (256, 256, 256, 64),
    3: (128, 128, 512, 128),
    4: (64, 64, 1024, 256),
    5: (32, 32, 2048, 512),
}


def make_case(rng, b, h, w, c3, c1):
    x8 = jnp.asarray(rng.randint(-128, 128, (b, h, w, c3)), jnp.int8)
    k = lambda *s: jnp.asarray(rng.randint(-127, 128, s), jnp.int8)
    v = lambda n, s=1.0: jnp.asarray(
        (rng.uniform(0.5, 1.5, (n,)) * s).astype(np.float32)
    )
    return dict(
        x8=x8, sx=jnp.float32(3.0),
        ka8=k(1, 1, c3, c1), kb8=k(3, 3, c1, c1), kc8=k(1, 1, c1, c3),
        sw=(v(c1, 0.01), v(c1, 0.002), v(c3, 0.01)),
        biases=(v(c1, 0.1), v(c1, 0.1), v(c3, 0.1)),
        bns=((v(c1), v(c1, 0.1)), (v(c1), v(c1, 0.1)), (v(c3), v(c3, 0.1))),
        s_b=jnp.float32(4.0), s_c=jnp.float32(5.0), s_out=jnp.float32(6.0),
    )


def unfused(case):
    """The XLA int8 chain as QuantConv emits it (bf16 epilogues)."""
    dt = jnp.bfloat16

    def qconv(x8, sxq, k8, swk, bias, bn, pad):
        y32 = jax.lax.conv_general_dilated(
            x8, k8, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = (y32.astype(jnp.float32) * (sxq / 127.0 * swk)).astype(dt)
        y = y + bias.astype(dt)
        inv, shift = bn
        return y * inv.astype(dt) + shift.astype(dt)

    sw_a, sw_b, sw_c = case["sw"]
    bias_a, bias_b, bias_c = case["biases"]
    bn_a, bn_b, bn_c = case["bns"]
    m1 = jax.nn.relu(
        qconv(case["x8"], case["sx"], case["ka8"], sw_a, bias_a, bn_a, "VALID")
    )
    m1_8 = quantize_act(m1, case["s_b"])
    m2 = jax.nn.relu(
        qconv(m1_8, case["s_b"], case["kb8"], sw_b, bias_b, bn_b, "SAME")
    )
    m2_8 = quantize_act(m2, case["s_c"])
    y = qconv(m2_8, case["s_c"], case["kc8"], sw_c, bias_c, bn_c, "VALID")
    short = (
        case["x8"].astype(jnp.float32) * (case["sx"] / 127.0)
    ).astype(dt)
    return quantize_act(jax.nn.relu(y + short), case["s_out"])


def fused(case):
    return fused_identity_block_int8(
        case["x8"], case["sx"], case["ka8"], case["kb8"], case["kc8"],
        *case["sw"], *case["biases"],
        case["bns"][0], case["bns"][1], case["bns"][2],
        case["s_b"], case["s_c"], case["s_out"],
    )


def timed(fn, case, iters, label, roof_ms):
    @jax.jit
    def run(n, x8):
        def body(_, carry):
            x, acc = carry
            y = fn({**case, "x8": x})
            # int8 data dependency chains iterations without extra compute
            return y, acc + y[0, 0, 0, 0].astype(jnp.int32)
        return jax.lax.fori_loop(0, n, body, (x8, jnp.int32(0)))[1]

    x8 = case["x8"]
    int(run(jnp.int32(1), x8)); int(run(jnp.int32(1), x8))
    t0 = time.time(); int(run(jnp.int32(1), x8)); t1 = time.time() - t0
    t0 = time.time(); int(run(jnp.int32(1 + iters), x8)); tm = time.time() - t0
    ms = 1000.0 * max(tm - t1, 0.0) / iters
    print(f"{label:32s} {ms:8.2f} ms/block (int8 MXU roofline {roof_ms:5.2f})",
          flush=True)
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--stages", type=int, nargs="*", default=[2, 3, 4, 5])
    args = p.parse_args()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.RandomState(0)
    for s in args.stages:
        h, w, c3, c1 = STAGES[s]
        macs = args.batch * h * w * (2 * c3 * c1 + 9 * c1 * c1)
        roof = 2 * macs / 394e12 * 1e3
        case = make_case(rng, args.batch, h, w, c3, c1)
        timed(unfused, case, args.iters, f"stage{s} unfused XLA b{args.batch}", roof)
        timed(fused, case, args.iters, f"stage{s} FUSED pallas b{args.batch}", roof)


if __name__ == "__main__":
    main()
