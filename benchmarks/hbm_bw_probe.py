"""Sustained HBM bandwidth on the serving chip, for honest rooflines.

The backbone audit's memory rooflines divide ideal fused traffic by the
v5e paper bandwidth (819 GB/s). Real streaming kernels sustain less; this
probe measures what a simple full-array elementwise pass actually reaches
so the audit's "measured vs roofline" gaps can be attributed to traffic
(unfused passes, lane padding) vs plain bandwidth efficiency.

The loop carries the produced tensor as the next input (y = body(x) ->
x' = y), which defeats both loop hoisting and the slice-DCE trap
(CLAUDE.md: XLA computes only the elements you read unless the full
tensor is a loop carry). Requant/dequant pass costs are NOT probed here —
any consume trick either fuses the write away or adds unmodeled traffic;
the audit's conv microprobes (bare vs +requant at stage shapes) cover
those.

Run:  python benchmarks/hbm_bw_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, *args, iters=8):
    float(jnp.sum(fn(*args, jnp.int32(1)).astype(jnp.float32)))
    t0 = time.time()
    float(jnp.sum(fn(*args, jnp.int32(1)).astype(jnp.float32)))
    t1 = time.time() - t0
    t0 = time.time()
    float(jnp.sum(fn(*args, jnp.int32(1 + iters)).astype(jnp.float32)))
    tm = time.time() - t0
    return max(tm - t1, 1e-9) / iters


def loop_carry(body):
    @jax.jit
    def run(x, it):
        y = jax.lax.fori_loop(0, it, lambda _, xc: body(xc), x)
        return y[:8]

    return run


def main():
    n = 256 * 1024 * 1024  # elements (512MB bf16, 256MB int8)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)
    x16 = jax.jit(lambda k: jax.random.normal(k, (n,), jnp.bfloat16))(key)
    x8 = jax.jit(lambda v: (v * 10).astype(jnp.int8))(x16)
    x32 = jax.jit(lambda v: (v * 100).astype(jnp.int32))(x16)

    rows = [
        ("copy_bf16 (r2+w2)", x16, lambda v: v + jnp.bfloat16(1.0), 4),
        ("copy_int8 (r1+w1)", x8, lambda v: v ^ jnp.int8(1), 2),
        ("copy_int32 (r4+w4)", x32, lambda v: v ^ jnp.int32(1), 8),
    ]
    for name, x, body, bpe in rows:
        dt = timed(loop_carry(body), x)
        print(
            f"{name:22s} {1e3 * dt:7.2f} ms  {n * bpe / dt / 1e9:6.1f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
