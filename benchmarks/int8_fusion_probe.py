"""Does the requant epilogue fuse into the int8 conv, or does s32 materialize?

Probes: (a) HLO text of conv+dequant+relu+requant chain, (b) timing of
accumulator-dtype variants on a big conv.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.RandomState(0)
B, H, W, C = 8, 256, 256, 256
x8 = jnp.asarray(rng.randint(-127, 128, (B, H, W, C)), jnp.int8)
k8 = jnp.asarray(rng.randint(-127, 128, (3, 3, C, C)), jnp.int8)
sw = jnp.asarray(rng.rand(C).astype(np.float32) * 0.01)


def chain(x8, k8, sw, pref):
    y = jax.lax.conv_general_dilated(
        x8, k8, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pref,
    )
    y = y.astype(jnp.float32) * sw          # dequant
    y = jnp.maximum(y, 0.0)                  # relu
    q = jnp.round(y * 8.0)                   # requant for next conv
    return jnp.clip(q, -128, 127).astype(jnp.int8)


# --- HLO inspection (s32 accumulator) ---
lowered = jax.jit(lambda a, b, s: chain(a, b, s, jnp.int32)).lower(x8, k8, sw)
txt = lowered.compile().as_text()
lines = [l.strip() for l in txt.splitlines() if "convolution" in l or "fusion" in l]
print("== HLO ops mentioning convolution/fusion ==")
for l in lines[:20]:
    print(l[:220])
big_s32 = [l.strip() for l in txt.splitlines() if "s32[8,256,256,256]" in l]
print(f"\n{len(big_s32)} HLO lines with full-size s32 tensors (materialization risk)")
for l in big_s32[:6]:
    print(l[:220])


# --- timing variants ---
def timed(fn, *args, iters=30):
    def loop(a, b, s, n):
        def body(_, carry):
            a8, acc = carry
            out = fn(a8, b, s)
            acc = acc + jnp.sum(out.astype(jnp.int32))
            a8 = (a8.astype(jnp.int32) + 0 * (acc % 1)).astype(jnp.int8)
            return a8, acc
        _, acc = jax.lax.fori_loop(0, n, body, (a, jnp.int32(0)))
        return acc
    one = jax.jit(lambda a, b, s: loop(a, b, s, 1))
    many = jax.jit(lambda a, b, s: loop(a, b, s, iters))
    int(one(*args)); int(many(*args))
    t0 = time.time(); int(one(*args)); t1 = time.time()
    t2 = time.time(); int(many(*args)); t3 = time.time()
    return ((t3 - t2) - (t1 - t0)) / (iters - 1) * 1e3


for name, pref in [("s32 acc", jnp.int32), ("f32 acc", jnp.float32), ("bf16 acc", jnp.bfloat16)]:
    try:
        t = timed(lambda a, b, s: chain(a, b, s, pref), x8, k8, sw)
        print(f"{name}: {t:.3f} ms")
    except Exception as e:
        print(f"{name}: FAILED {repr(e)[:150]}")
