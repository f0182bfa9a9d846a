"""Chained-conv microbench: int8 vs bf16 MXU rate at ResNet stage shapes.

A chain of N sequential convs (each consuming the last, requantized) makes
per-dtype throughput measurable above relay noise.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
import jax.numpy as jnp
import numpy as np

N = 24


def timed(many, one, *args, iters=None):
    float(one(*args)); float(many(*args))
    t0 = time.time(); float(one(*args)); t1 = time.time()
    t2 = time.time(); float(many(*args)); t3 = time.time()
    return (t3 - t2) - (t1 - t0)


def chain_bf16(x, k):
    def body(i, carry):
        xc, acc = carry
        y = jax.lax.conv_general_dilated(
            xc, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.maximum(y, 0) * 0.01
        return y.astype(jnp.bfloat16), acc + jnp.sum(y.astype(jnp.float32))
    return body


def chain_int8(x, k8):
    def body(i, carry):
        xc, acc = carry
        y = jax.lax.conv_general_dilated(
            xc, k8, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        yf = y.astype(jnp.float32) * 1e-3
        yf = jnp.maximum(yf, 0)
        q = jnp.clip(jnp.round(yf), -128, 127).astype(jnp.int8)
        return q, acc + jnp.sum(yf)
    return body


def run_case(name, h, w, cin, cout, kk, batch=8):
    rng = np.random.RandomState(0)
    flops = 2 * batch * h * w * kk * kk * cin * cout * N
    xf = jnp.asarray(rng.rand(batch, h, w, cin), jnp.bfloat16)
    kf = jnp.asarray(rng.rand(kk, kk, cin, cout) * 0.01, jnp.bfloat16)
    x8 = jnp.asarray(rng.randint(-127, 128, (batch, h, w, cin)), jnp.int8)
    k8 = jnp.asarray(rng.randint(-127, 128, (kk, kk, cin, cout)), jnp.int8)
    # square chains only (cin == cout) so output feeds input
    assert cin == cout

    def loop(body, n):
        return lambda x, k: jax.lax.fori_loop(
            0, n, body(x, k), (x, jnp.float32(0)))[1]

    bf = timed(jax.jit(loop(chain_bf16, N)), jax.jit(loop(chain_bf16, 1)), xf, kf)
    i8 = timed(jax.jit(loop(chain_int8, N)), jax.jit(loop(chain_int8, 1)), x8, k8)
    n1 = N - 1
    print(f"{name:22s} bf16 {bf/n1*1e3:7.3f} ms/conv ({flops/N/(bf/n1)/1e12:6.1f} TF/s)"
          f"   int8 {i8/n1*1e3:7.3f} ms/conv ({flops/N/(i8/n1)/1e12:6.1f} TOP/s)"
          f"   {bf/i8:5.2f}x")


print("devices:", jax.devices())
run_case("stage2 3x3 256^2 c64", 256, 256, 64, 64, 3)
run_case("stage3 3x3 128^2 c128", 128, 128, 128, 128, 3)
run_case("stage4 3x3 64^2 c256", 64, 64, 256, 256, 3)
run_case("stage5 3x3 32^2 c512", 32, 32, 512, 512, 3)
run_case("stage4 1x1 64^2 c1024", 64, 64, 1024, 1024, 1)
run_case("fpn 3x3 256^2 c256", 256, 256, 256, 256, 3)


# hypothesis: in-loop weight quantization (as QuantConv does from float
# params) serializes with the convs and eats the int8 win
def chain_int8_wq(x, kf):
    from objectdetection_tpu.quant import weight_qparams
    def body(i, carry):
        xc, acc = carry
        k8, sw = weight_qparams(kf)
        y = jax.lax.conv_general_dilated(
            xc, k8, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        yf = y.astype(jnp.float32) * 1e-3 * sw
        yf = jnp.maximum(yf, 0)
        q = jnp.clip(jnp.round(yf), -128, 127).astype(jnp.int8)
        return q, acc + jnp.sum(yf)
    return body


def run_wq(name, h, w, c, kk, batch=8):
    rng = np.random.RandomState(0)
    kf = jnp.asarray(rng.rand(kk, kk, c, c) * 0.01, jnp.bfloat16)
    x8 = jnp.asarray(rng.randint(-127, 128, (batch, h, w, c)), jnp.int8)
    def loop(body, n):
        return lambda x, k: jax.lax.fori_loop(0, n, body(x, k), (x, jnp.float32(0)))[1]
    t = timed(jax.jit(loop(chain_int8_wq, N)), jax.jit(loop(chain_int8_wq, 1)), x8, kf)
    print(f"{name:28s} int8+in-loop-wq {t/(N-1)*1e3:7.3f} ms/conv")


run_wq("stage4 1x1 64^2 c1024 wq", 64, 64, 1024, 1)
run_wq("fpn 3x3 256^2 c256 wq", 256, 256, 256, 3)
