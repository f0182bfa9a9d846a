"""Probe: the stage2/3 narrow 3x3 convs are 2-5.5x off roofline — why?

The r3 audit (backbone_audit.py) measured the s2 3x3 256²x64->64 int8 conv
at 3.24 ms/b48 vs a 0.49 ms memory / 0.59 ms compute roofline. The int8 MXU
tile is (32, 128): cin=64 pads K to 128 and cout=64 pads N to 128 — a 4x
MXU waste that would land right at the measured number. This times the
narrow 3x3 shapes under alternative lowerings:

  conv_i8    int8 conv HLO (current backbone path)
  conv_bf16  bf16 conv HLO (half peak TOPS but maybe better narrow tiling)
  conv_f32   f32 conv HLO
  tap_dot    9 shifted int8 dots accumulated (reads x 9x — bandwidth check)

Run per-shape in its own process (the relay poisons allocations after OOM):
  python benchmarks/narrow3x3_probe.py --shape 0
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
    ("s2 3x3 256²x64->64", 48, 256, 64, 64),
    ("s3 3x3 128²x128->128", 96, 128, 128, 128),
    ("s5 3x3 32²x512->512", 96, 32, 512, 512),
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
    k8 = jnp.asarray(rng.randint(-127, 128, (3, 3, cin, cout)), jnp.int8)
    xb = x8.astype(jnp.bfloat16)
    kb = k8.astype(jnp.bfloat16)
    xf = x8.astype(jnp.float32)
    kf = k8.astype(jnp.float32)
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
                if mode in ("conv_i8", "conv_bf16", "conv_f32"):
                    pet = jnp.int32 if mode == "conv_i8" else jnp.float32
                    y = jax.lax.conv_general_dilated(
                        xc, k, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=pet,
                    )
                else:  # tap_dot: 9 shifted int8 dots, accumulated in int32
                    xp = jnp.pad(xc, ((0, 0), (1, 1), (1, 1), (0, 0)))
                    y = jnp.zeros((b, hw, hw, cout), jnp.int32)
                    for dy in range(3):
                        for dx in range(3):
                            tap = jax.lax.dynamic_slice(
                                xp, (0, dy, dx, 0), (b, hw, hw, cin)
                            )
                            y = y + jax.lax.dot_general(
                                tap.reshape(-1, cin), k[dy, dx],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32,
                            ).reshape(b, hw, hw, cout)
                y8 = epi(y)
                s = jnp.sum(y8.astype(jnp.int32))
                upd = (s & 1).astype(xc.dtype).reshape(1, 1, 1, 1)
                xn = jax.lax.dynamic_update_slice(xc, upd, (0, 0, 0, 0))
                return xn, acc + s.astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))[1]

        return run

    g = b * hw * hw * cin * cout * 9 / 1e9
    cmp_ms = 2 * g / (INT8_TOPS / 1e9) * 1e3
    mem_i8 = b * hw * hw * (cin + cout) + 9 * cin * cout
    print(
        f"{name} b{b}: cmp {cmp_ms:5.2f} memI8 "
        f"{mem_i8 / 1e9 / HBM_GBPS * 1e3:5.2f}",
        flush=True,
    )
    for mode, x, k in (
        ("conv_i8", x8, k8),
        ("conv_bf16", xb, kb),
        ("conv_f32", xf, kf),
        ("tap_dot", x8, k8),
    ):
        ms = timed(mk(mode), args.iters, x, k)
        print(f"  {mode:10s} {ms:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
