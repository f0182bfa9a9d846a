"""Probe: are the backbone's 1x1 int8 convs leaving bandwidth on the table?

The r3 audit (benchmarks/backbone_audit.py) convicted the 1x1 convs: the
s4 1x1 1024->256 row measures 2.6-5x its HBM roofline while the 3x3s sit
near theirs. A 1x1 conv is a plain matmul over flattened pixels — this
times the same shape as (a) conv HLO int8, (b) reshaped dot_general int8,
(c) conv bf16, (d) reshaped dot bf16, all with the standard
scale+bias+relu+requant epilogue, to find the fastest lowering.

Run per-shape in its own process (the relay poisons allocations after an
OOM):  python benchmarks/one_by_one_probe.py --shape 0
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

INT8_TOPS = 394e12
HBM_GBPS = 819.0

# (name, batch, hw, cin, cout)
SHAPES = [
    ("s4 1x1 64²x1024->256", 96, 64, 1024, 256),
    ("s4 1x1 64²x256->1024", 96, 64, 256, 1024),
    ("s3 1x1 128²x512->128", 96, 128, 512, 128),
    ("s2 1x1 256²x256->64", 48, 256, 256, 64),
    ("s2 1x1 256²x64->256", 48, 256, 64, 256),
    ("s5 1x1 32²x2048->512", 96, 32, 2048, 512),
    ("s3 1x1 128²x128->512", 96, 128, 128, 512),
    ("s5 1x1 32²x512->2048", 96, 32, 512, 2048),
]


def timed(run, iters, *args):
    float(run(jnp.int32(1), *args))
    float(run(jnp.int32(1), *args))
    t0 = time.time(); float(run(jnp.int32(1), *args)); t1 = time.time() - t0
    t0 = time.time(); float(run(jnp.int32(1 + iters), *args)); tm = time.time() - t0
    return 1000.0 * max(tm - t1, 1e-9) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, required=True)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    name, b, hw, cin, cout = SHAPES[args.shape]

    rng = np.random.RandomState(0)
    x8 = jnp.asarray(rng.randint(-127, 128, (b, hw, hw, cin)), jnp.int8)
    k8 = jnp.asarray(rng.randint(-127, 128, (1, 1, cin, cout)), jnp.int8)
    xb = x8.astype(jnp.bfloat16)
    kb = k8.astype(jnp.bfloat16)
    sw = jnp.asarray(rng.rand(cout) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.rand(cout), jnp.float32)
    oq = jnp.float32(3.0)

    def epi(y):
        y = y.astype(jnp.float32) * (sw * 0.01)
        y = jnp.maximum(y + bias, 0.0)
        q = jnp.clip(jnp.round(y * (127.0 / oq)), -128.0, 127.0)
        return q.astype(jnp.int8)

    def mk(mode):
        @jax.jit
        def run(n, x, k):
            def body(_, carry):
                xc, acc = carry
                if mode == "conv_i8":
                    y = jax.lax.conv_general_dilated(
                        xc, k, (1, 1), "VALID",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.int32,
                    )
                elif mode == "dot_i8":
                    y = jax.lax.dot_general(
                        xc.reshape(-1, cin), k.reshape(cin, cout),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).reshape(b, hw, hw, cout)
                elif mode == "conv_bf16":
                    y = jax.lax.conv_general_dilated(
                        xc, k, (1, 1), "VALID",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.float32,
                    )
                else:  # dot_bf16
                    y = jax.lax.dot_general(
                        xc.reshape(-1, cin), k.reshape(cin, cout),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(b, hw, hw, cout)
                y8 = epi(y)
                s = jnp.sum(y8.astype(jnp.int32))
                # data dependency WITHOUT a full input rewrite (a clip(x+s)
                # feedback costs an extra read+write of x per iteration —
                # ~1 ms of hidden traffic at these shapes, swamping the
                # conv): poke ONE element in place
                upd = (s & 1).astype(xc.dtype).reshape(1, 1, 1, 1)
                xn = jax.lax.dynamic_update_slice(xc, upd, (0, 0, 0, 0))
                return xn, acc + s.astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))[1]

        return run

    g = b * hw * hw * cin * cout / 1e9
    cmp_ms = 2 * g / (INT8_TOPS / 1e9) * 1e3
    mem_i8 = b * hw * hw * (cin + cout) + cin * cout
    mem_bf = 2 * b * hw * hw * cin + b * hw * hw * cout + 2 * cin * cout
    print(
        f"{name} b{b}: cmp {cmp_ms:5.2f} memI8 "
        f"{mem_i8 / 1e9 / HBM_GBPS * 1e3:5.2f} "
        f"memBF {mem_bf / 1e9 / HBM_GBPS * 1e3:5.2f}",
        flush=True,
    )
    for mode, x, k in (
        ("conv_i8", x8, k8),
        ("dot_i8", x8, k8),
        ("conv_bf16", xb, kb),
        ("dot_bf16", xb, kb),
    ):
        ms = timed(mk(mode), args.iters, x, k)
        print(f"  {mode:10s} {ms:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
