"""Stage-level int8 vs bf16 timing + HLO materialization audit.

Decomposes extract (backbone+FPN+RPN) into ResNet bottom-up vs FPN+RPN to
localize where int8 does / does not pay, and greps the optimized HLO for
large materialized buffers per dtype.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import collections
import re
import time

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_tpu.config import COCO_CONFIG
from objectdetection_tpu import detector, quant
from objectdetection_tpu.checkpoint import cast_params_for_inference
from objectdetection_tpu.models.backbone import ResNetBottomUp

B = 8
rng = np.random.RandomState(0)
images = jnp.asarray(rng.rand(B, 1024, 1024, 3).astype(np.float32) * 255 - 128)


def timeit(jit_loop, *args, iters=20):
    float(jit_loop(*args, jnp.int32(1)))
    t0 = time.time(); float(jit_loop(*args, jnp.int32(1))); t1 = time.time()
    float(jit_loop(*args, jnp.int32(1 + iters)))
    t2 = time.time(); float(jit_loop(*args, jnp.int32(1 + iters))); t3 = time.time()
    return ((t3 - t2) - (t1 - t0)) / iters * 1e3


def extract_loop(cfg):
    model = detector.build_model(cfg)

    @jax.jit
    def run(variables, images, n):
        def body(_, carry):
            imgs, acc = carry
            feats, _, probs, _ = model.apply(variables, imgs, method=model.extract)
            acc = acc + jnp.sum(probs) + sum(jnp.sum(f.astype(jnp.float32)) for f in feats)
            return imgs + 1e-20 * acc, acc
        _, acc = jax.lax.fori_loop(0, n, body, (images, jnp.float32(0)))
        return acc

    return run


def bottomup_loop(cfg, quantized):
    mod = ResNetBottomUp(
        model=cfg.backbone, dtype=jnp.dtype(cfg.compute_dtype),
        quantized=quantized,
    )

    def consume(c):
        if isinstance(c, tuple):
            return jnp.sum(c[0].astype(jnp.float32))
        return jnp.sum(c.astype(jnp.float32))

    @jax.jit
    def run(variables, images, n):
        def body(_, carry):
            imgs, acc = carry
            cs = mod.apply(variables, imgs)
            acc = acc + sum(consume(c) for c in cs)
            return imgs + 1e-20 * acc, acc
        _, acc = jax.lax.fori_loop(0, n, body, (images, jnp.float32(0)))
        return acc

    return mod, run


def subtree(variables, path):
    out = {}
    for col, tree in variables.items():
        node = tree
        ok = True
        for p in path:
            if p in node:
                node = node[p]
            else:
                ok = False
                break
        if ok:
            out[col] = node
    return out


def hlo_audit(cfg, variables):
    model = detector.build_model(cfg)
    f = jax.jit(lambda v, i: model.apply(v, i, method=model.extract))
    txt = f.lower(variables, images).compile().as_text()
    # count only ENTRY-computation instructions: those are the values that
    # actually materialize in HBM (fused-computation internals are free)
    entry = txt[txt.index("ENTRY "):]
    pat = re.compile(r"%\S+ = (s8|bf16|f32|s32)\[([\d,]+)\]")
    sizes = collections.Counter()
    nbytes = {"s8": 1, "bf16": 2, "f32": 4, "s32": 4}
    for m in pat.finditer(entry):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            n *= int(d)
        mb = n * nbytes[dt] / 1e6
        if mb >= 16:
            sizes[(dt, round(mb))] += 1
    total = collections.Counter()
    for (dt, mb), c in sizes.items():
        total[dt] += mb * c
    print("big (>=16MB) HLO values by dtype:")
    for (dt, mb), c in sorted(sizes.items(), key=lambda kv: -kv[0][1]):
        print(f"  {dt:5s} {mb:6d} MB x{c}")
    print("approx total MB touched by dtype:", dict(total))
    # name the largest bf16/f32 survivors — fusion opportunities
    for m in re.finditer(
        r"%(\S+) = (bf16|f32)\[([\d,]+)\][^\n]*?(?:op_name=\"([^\"]*)\")?[^\n]*",
        entry,
    ):
        name, dt, dims, op = m.groups()
        n = 1
        for d in dims.split(","):
            n *= int(d)
        mb = n * nbytes[dt] / 1e6
        if mb >= 100:
            print(f"  SURVIVOR {dt} {mb:.0f}MB {name[:60]} op={str(op)[:90]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="time", choices=["time", "hlo"])
    args = ap.parse_args()

    cfg_q = COCO_CONFIG.replace(quantized_inference=True)
    cfg_f = COCO_CONFIG
    v = detector.init_variables(cfg_q, jax.random.PRNGKey(0))
    v = cast_params_for_inference(v)
    v = quant.calibrate_variables(v, images, cfg_q)
    vf = {"params": v["params"], "batch_stats": v["batch_stats"]}

    if args.mode == "hlo":
        hlo_audit(cfg_q, v)
        return

    bu_f_mod, bu_f = bottomup_loop(cfg_f, False)
    bu_q_mod, bu_q = bottomup_loop(cfg_q, True)
    v_bu = subtree(v, ["fpn", "resnet"])
    vf_bu = {k: v_ for k, v_ in v_bu.items() if k != "quant"}

    t = timeit(bu_f, vf_bu, images)
    print(f"bottomup bf16: {t:7.2f} ms/b{B}")
    t2 = timeit(bu_q, v_bu, images)
    print(f"bottomup int8: {t2:7.2f} ms/b{B}  ({t/t2:.2f}x)")

    t3 = timeit(extract_loop(cfg_f), vf, images)
    print(f"extract  bf16: {t3:7.2f} ms/b{B}   (fpn+rpn {t3-t:.2f})")
    t4 = timeit(extract_loop(cfg_q), v, images)
    print(f"extract  int8: {t4:7.2f} ms/b{B}  ({t3/t4:.2f}x, fpn+rpn {t4-t2:.2f})")


if __name__ == "__main__":
    main()
