"""Are stage-2's narrow (64-ch) convs lane-padding-bound on v5e?

Times the stage-2 bottleneck conv shapes against widened-channel
equivalents at the same MAC count. If the 64-channel versions run far below
the widened ones, a space-to-depth stage-2 layout (64ch @ 256² -> 256ch @
128²) is the fix for the measured 7x-off-roofline stage-2 time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 32


def timed_conv(name, x, k, iters=10, stride=1):
    @jax.jit
    def run(n, x, k):
        def body(_, carry):
            xc, acc = carry
            y = jax.lax.conv_general_dilated(
                xc, k, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            s = jnp.sum(y.astype(jnp.float32))
            return xc + (1e-20 * s).astype(xc.dtype), acc + s
        return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))[1]

    float(run(jnp.int32(1), x, k)); float(run(jnp.int32(1), x, k))
    t0 = time.time(); float(run(jnp.int32(1), x, k)); t1 = time.time() - t0
    t0 = time.time(); float(run(jnp.int32(1 + iters), x, k)); tm = time.time() - t0
    ms = 1000.0 * max(tm - t1, 0.0) / iters
    macs = (
        x.shape[0] * (x.shape[1] // stride) * (x.shape[2] // stride)
        * k.shape[0] * k.shape[1] * k.shape[2] * k.shape[3]
    )
    print(f"{name:42s} {ms:8.2f} ms  {2 * macs / ms * 1e3 / 1e12:6.1f} TF/s",
          flush=True)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)

    def mk(shape, dt=jnp.bfloat16, k=0):
        return jax.jit(
            lambda kk: jax.random.normal(kk, shape, jnp.float32).astype(dt)
        )(jax.random.fold_in(key, k + sum(shape)))

    cases = [
        # stage2 shapes (narrow)
        ("s2 3x3 64->64 @256²", (B, 256, 256, 64), (3, 3, 64, 64)),
        ("s2 1x1 64->256 @256²", (B, 256, 256, 64), (1, 1, 64, 256)),
        ("s2 1x1 256->64 @256²", (B, 256, 256, 256), (1, 1, 256, 64)),
        # widened equivalents at the same MACs (s2d-style layout)
        ("s2d 3x3 256->256 @128² (16x MACs of 64x64)", (B, 128, 128, 256), (3, 3, 256, 256)),
        ("s2d 1x1 256->256 @128²", (B, 128, 128, 256), (1, 1, 256, 256)),
        # stage3 control (128 ch)
        ("s3 3x3 128->128 @128²", (B, 128, 128, 128), (3, 3, 128, 128)),
    ]
    for name, xs, ks in cases:
        timed_conv(name, mk(xs), mk(ks, k=1))


if __name__ == "__main__":
    main()
