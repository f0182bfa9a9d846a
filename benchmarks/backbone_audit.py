"""Bytes-moved audit of the int8 R101 bottom-up backbone (VERDICT r2 #1a).

Per stage: measured ms vs TWO rooflines —
  * compute: int8 MXU TOPS
  * memory: an analytic HBM-traffic model under two fusion assumptions:
      - "fused":   every conv epilogue (scale/bias/BN/relu + the NEXT conv's
                   quantize_act) fuses into the conv, so only int8 tensors
                   ever hit HBM (the docstring claim in models/backbone.py)
      - "unfused": conv outputs materialize in bf16, and each quantize_act
                   is a separate read-bf16/write-int8 pass

and microprobes at single-conv granularity that tell the two apart: an
epilogue that is truly fused adds ~zero time over the bare conv.

Run on TPU:  python benchmarks/backbone_audit.py --batch 96
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_tpu import quant

INT8_TOPS = 394e12
HBM_GBPS = 819.0

# (name, in_hw, cin, (f1, f2, f3), blocks, first_stride)
STAGES = [
    ("stage2", 256, 64, (64, 64, 256), 3, 1),
    ("stage3", 256, 256, (128, 128, 512), 4, 2),
    ("stage4", 128, 512, (256, 256, 1024), 23, 2),
    ("stage5", 64, 1024, (512, 512, 2048), 3, 2),
]


def timed(run, iters, *args):
    """run(n, *args) -> scalar; returns ms/iter via the on-device loop-delta
    method (CLAUDE.md: relay dispatch ~40 ms, block_until_ready no-op)."""
    float(run(jnp.int32(1), *args))
    float(run(jnp.int32(1), *args))
    t0 = time.time(); float(run(jnp.int32(1), *args)); t1 = time.time() - t0
    t0 = time.time(); float(run(jnp.int32(1 + iters), *args)); tm = time.time() - t0
    return 1000.0 * max(tm - t1, 1e-9) / iters


def stage_models(b, hw, cin, filters, blocks, stride):
    """Returns (gmacs, fused_bytes, unfused_bytes) for the whole stage."""
    f1, f2, f3 = filters
    o = hw // stride
    px = b * o * o

    gmacs = px * (cin * f1 + 9 * f1 * f2 + f2 * f3 + cin * f3) / 1e9
    gmacs += (blocks - 1) * px * (f3 * f1 + 9 * f1 * f2 + f2 * f3) / 1e9

    def block_bytes(first):
        cin_b = cin if first else f3
        inpx = b * hw * hw if first else px
        # weights (int8) read once per pass
        w = cin_b * f1 + 9 * f1 * f2 + f2 * f3 + (cin_b * f3 if first else 0)
        # fused: conv reads int8 input, writes int8 output (epilogue+requant
        # inside); residual add reads the shortcut int8 and the branch int8
        # rides the conv2c epilogue
        fused = (
            inpx * cin_b + px * f1          # conv2a r/w
            + px * f1 + px * f2             # conv2b r/w
            + px * f2 + px * f3             # conv2c r (+ fused add+requant) w
            + (inpx * cin_b + px * f3 if first else px * f3)  # shortcut
            + w
        )
        # unfused: conv output materializes bf16 (2B), then a separate
        # requant pass (read bf16, write int8) before the next conv; the
        # residual add+relu reads two bf16 tensors and writes bf16, then the
        # out-quantize writes int8
        unfused = (
            inpx * cin_b + 2 * px * f1      # conv2a: r int8, w bf16
            + 3 * px * f1                   # quantize: r bf16 w int8
            + px * f1 + 2 * px * f2         # conv2b
            + 3 * px * f2                   # quantize
            + px * f2 + 2 * px * f3         # conv2c (bf16 out)
            + (inpx * cin_b + 2 * px * f3 if first else 3 * px * f3)  # shortcut (dequant r int8 w bf16)
            + 2 * px * f3 * 2 + 2 * px * f3  # add+relu: r 2x bf16, w bf16
            + 2 * px * f3 + px * f3         # out quantize
            + w
        )
        return fused, unfused

    fb, ub = block_bytes(True)
    fi, ui = block_bytes(False)
    return gmacs, fb + (blocks - 1) * fi, ub + (blocks - 1) * ui


def run_stage_timings(b, iters):
    from objectdetection_tpu.models.backbone import BottleneckBlock
    import flax.linen as nn

    print(f"--- per-stage: measured vs rooflines (batch {b}) ---", flush=True)
    print(f"{'stage':8s} {'ms':>8s} {'TOP/s':>7s} {'cmp_ms':>7s} "
          f"{'memF_ms':>8s} {'memU_ms':>8s} {'GB/s(F)':>8s} {'GB/s(U)':>8s}",
          flush=True)

    results = {}
    for name, hw, cin, filters, blocks, stride in STAGES:
        stage_idx = int(name[-1])
        ms = None
        for b_try in (b, b // 2, b // 4):
            try:
                ms = _time_stage(
                    b_try, iters, name, hw, cin, filters, blocks, stride
                )
                break
            except Exception as e:  # RESOURCE_EXHAUSTED on the big stages
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                print(f"{name}: OOM at batch {b_try}, halving", flush=True)
        if ms is None:
            print(f"{name}: OOM even at batch {b // 4}, skipped", flush=True)
            continue
        results[name] = _report_stage(
            name, ms, b_try, b, hw, cin, filters, blocks, stride
        )
    print(f"total bottom-up (ex stem): {sum(results.values()):.1f} ms",
          flush=True)
    return results


def _report_stage(name, ms, b_meas, b_report, hw, cin, filters, blocks, stride):
    """Print one roofline row, normalizing the measurement to b_report."""
    ms = ms * (b_report / b_meas)  # stages are linear in batch
    note = f" (measured at b{b_meas}, scaled)" if b_meas != b_report else ""
    g, fby, uby = stage_models(b_report, hw, cin, filters, blocks, stride)
    cmp_ms = 2 * g / (INT8_TOPS / 1e9) * 1e3
    memf_ms = fby / 1e9 / HBM_GBPS * 1e3
    memu_ms = uby / 1e9 / HBM_GBPS * 1e3
    tops = 2 * g / (ms / 1e3) / 1e3
    gbf = fby / 1e9 / (ms / 1e3)
    gbu = uby / 1e9 / (ms / 1e3)
    print(f"{name:8s} {ms:8.2f} {tops:7.1f} {cmp_ms:7.2f} "
          f"{memf_ms:8.2f} {memu_ms:8.2f} {gbf:8.0f} {gbu:8.0f}{note}",
          flush=True)
    return ms


def _time_stage(b, iters, name, hw, cin, filters, blocks, stride):
    from objectdetection_tpu.models.backbone import BottleneckBlock
    import flax.linen as nn

    stage_idx = int(name[-1])
    if True:

        class Stage(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = BottleneckBlock(
                    filters=filters, stride=stride, projection=True,
                    stage=stage_idx, block="a", dtype=jnp.bfloat16,
                    quantized=True, name=f"res{stage_idx}a",
                )(x)
                for i in range(1, blocks):
                    blk = chr(ord("a") + i) if i < 26 else f"b{i}"
                    x = BottleneckBlock(
                        filters=filters, stage=stage_idx, block=blk,
                        dtype=jnp.bfloat16, quantized=True,
                        name=f"res{stage_idx}{blk}",
                    )(x)
                return x

        mod = Stage()
        key = jax.random.PRNGKey(hw * cin)
        x = jax.jit(
            lambda k: jax.random.normal(k, (b, hw, hw, cin), jnp.float32)
            .astype(jnp.bfloat16)
        )(key)
        variables = mod.init(jax.random.PRNGKey(0), x)
        _, m = mod.apply(variables, x, mutable=["quant"])
        variables = {**variables, "quant": m["quant"]}
        variables = quant.freeze_weights(variables)
        sx = jnp.max(jnp.abs(x.astype(jnp.float32)))

        @jax.jit
        def run(n, variables, x, sx, mod=mod):
            x8 = quant.quantize_act(x, sx)

            def body(_, carry):
                xc, acc = carry
                out8, _ = mod.apply(variables, (xc, sx))
                s = jnp.sum(out8.astype(jnp.float32))
                xn = jnp.clip(
                    xc.astype(jnp.int32) + (s.astype(jnp.int32) & 1),
                    -128, 127,
                ).astype(jnp.int8)
                return xn, acc + s

            return jax.lax.fori_loop(0, n, body, (x8, jnp.float32(0)))[1]

        return timed(run, iters, variables, x, sx)


def time_stem(b, iters):
    """Stem (conv7x7/2 int8 + bn + relu + maxpool3x3/2) at 1024², the
    unattributed ~18 ms between the stage sum and the end-to-end backbone."""
    import flax.linen as nn

    from objectdetection_tpu.models.backbone import FrozenBatchNorm, Stage1Conv

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = Stage1Conv(quantized=True, dtype=jnp.bfloat16, name="conv1")(x)
            x = nn.relu(FrozenBatchNorm(name="bn_conv1", dtype=jnp.bfloat16)(x))
            return nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
            )

    mod = Stem()
    x = jax.jit(
        lambda k: jax.random.normal(k, (b, 1024, 1024, 3), jnp.float32)
        .astype(jnp.bfloat16) * 60.0
    )(jax.random.PRNGKey(0))
    variables = mod.init(jax.random.PRNGKey(0), x)
    _, m = mod.apply(variables, x, mutable=["quant"])
    variables = {**variables, "quant": m["quant"]}

    @jax.jit
    def run(n, variables, x):
        def body(_, carry):
            xc, acc = carry
            y = mod.apply(variables, xc)
            s = jnp.sum(y.astype(jnp.float32))
            upd = (s.astype(jnp.int32) & 1).astype(xc.dtype).reshape(
                1, 1, 1, 1
            )
            xn = jax.lax.dynamic_update_slice(xc, upd, (0, 0, 0, 0))
            return xn, acc + s

        return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))[1]

    ms = timed(run, iters, variables, x)
    # rooflines: int8 read of 1024²x3 + bf16 write of 512²x64 + maxpool r/w
    rd = b * 1024 * 1024 * 3
    wr = b * 512 * 512 * 64 * 2
    pool_traffic = wr + b * 256 * 256 * 64 * 2
    mem_ms = (rd + wr + pool_traffic) / 1e9 / HBM_GBPS * 1e3
    g = b * 512 * 512 * 49 * 3 * 64 / 1e9
    cmp_ms = 2 * g / (INT8_TOPS / 1e9) * 1e3
    print(
        f"stem b{b}: {ms:8.2f} ms  cmp {cmp_ms:5.2f}  mem {mem_ms:5.2f}",
        flush=True,
    )


def conv_probe(b, iters, only=None):
    """Single int8 convs at stage shapes, bare vs +epilogue vs +requant:
    a fused epilogue adds ~0 ms; a materializing one adds the elementwise
    pass times."""
    print(f"\n--- conv fusion microprobes (batch {b}) ---", flush=True)
    shapes = [
        ("s2 1x1 256²x64->256", 256, 64, 256, 1, 1),
        ("s2 3x3 256²x64->64", 256, 64, 64, 3, 1),
        ("s3 3x3 128²x128->128", 128, 128, 128, 3, 1),
        ("s4 1x1 64²x1024->256", 64, 1024, 256, 1, 1),
        ("s4 3x3 64²x256->256", 64, 256, 256, 3, 1),
        ("s4 1x1 64²x256->1024", 64, 256, 1024, 1, 1),
        ("s5 3x3 32²x512->512", 32, 512, 512, 3, 1),
    ]
    rng = np.random.RandomState(0)
    if only is not None:
        shapes = shapes[only : only + 1]
    for name, hw, cin, cout, k, stride in shapes:
        x8 = jnp.asarray(
            rng.randint(-127, 128, (b, hw, hw, cin)), jnp.int8
        )
        k8 = jnp.asarray(
            rng.randint(-127, 128, (k, k, cin, cout)), jnp.int8
        )
        sw = jnp.asarray(rng.rand(cout) + 0.5, jnp.float32)
        bias = jnp.asarray(rng.rand(cout), jnp.float32)
        oq = jnp.float32(3.0)

        def mk(mode):
            @jax.jit
            def run(n, x8, k8, sw, bias, mode=mode):
                def body(_, carry):
                    xc, acc = carry
                    y32 = quant.int8_conv(xc, k8, (stride, stride), "SAME")
                    if mode == "bare":
                        s = jnp.sum(y32)
                        out_feedback = s & 1
                    elif mode == "epilogue":
                        y = y32.astype(jnp.float32) * (sw * 0.01)
                        y = jnp.maximum(y + bias, 0.0).astype(jnp.bfloat16)
                        s = jnp.sum(y.astype(jnp.float32)).astype(jnp.int32)
                        out_feedback = s & 1
                    else:  # requant: epilogue + int8 out (the carried stream)
                        y = y32.astype(jnp.float32) * (sw * 0.01)
                        y = jnp.maximum(y + bias, 0.0)
                        y8 = quant.quantize_act(y, oq)
                        s = jnp.sum(y8.astype(jnp.int32))
                        out_feedback = s & 1
                    xn = jnp.clip(
                        xc.astype(jnp.int32) + out_feedback, -128, 127
                    ).astype(jnp.int8)
                    return xn, acc + s.astype(jnp.float32)

                return jax.lax.fori_loop(
                    0, n, body, (x8, jnp.float32(0))
                )[1]

            return run

        o = hw // stride
        g = b * o * o * cin * cout * k * k / 1e9
        cmp_ms = 2 * g / (INT8_TOPS / 1e9) * 1e3
        mem_min = (b * hw * hw * cin + b * o * o * cout + cin * cout * k * k)
        mem_ms = mem_min / 1e9 / HBM_GBPS * 1e3
        row = [f"{name:22s} cmp {cmp_ms:5.2f} mem {mem_ms:5.2f} |"]
        for mode in ("bare", "epilogue", "requant"):
            ms = timed(mk(mode), iters, x8, k8, sw, bias)
            row.append(f" {mode} {ms:6.2f}")
        print("".join(row), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--skip-stages", action="store_true")
    ap.add_argument("--skip-probes", action="store_true")
    ap.add_argument(
        "--stage", default=None,
        help="run ONE stage (stage2..stage5) in this process and exit — "
        "after a ResourceExhausted the relay backend rejects all further "
        "allocations in-process, so the driver runs stages as subprocesses",
    )
    ap.add_argument(
        "--probe", type=int, default=None,
        help="run ONE conv microprobe row (index) and exit",
    )
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    if args.stage == "stem":
        time_stem(args.batch, args.iters)
        return
    if args.stage is not None:
        spec = {s[0]: s for s in STAGES}[args.stage]
        name, hw, cin, filters, blocks, stride = spec
        b = args.batch
        ms = _time_stage(b, args.iters, name, hw, cin, filters, blocks, stride)
        _report_stage(name, ms, b, 96, hw, cin, filters, blocks, stride)
        return
    if args.probe is not None:
        conv_probe(args.batch, args.iters, only=args.probe)
        return
    if not args.skip_stages:
        run_stage_timings(args.batch, args.iters)
    if not args.skip_probes:
        conv_probe(args.batch, args.iters)


if __name__ == "__main__":
    main()
