"""Attribute the Pallas ROIAlign kernel's per-ROI SCAFFOLDING cost.

roi_inner_probe showed the full inner-loop compute (7 dynamic lane-slice
x-blends + the wy matmul) costs only 0.087 us/ROI with the patch resident
in VMEM — yet the production kernel's zero-DMA all-top-class mix measures
0.74 us/ROI (roi_align_k_probe). The ~0.65 us/ROI gap must be the per-ROI
control scaffolding: the ~10 (level, class) `pl.when` predicates that
guard every DMA start, the wait predicate, the top-cache check, and the
4-way class dispatch (ops/roi_align_pallas.py::_kernel start_dmas /
wait_dma / chunk). This probe rebuilds that scaffolding around the same
compute body, one piece at a time, with NO real kernel semantics:

  bare            inner compute only (should reproduce ~0.087 us/ROI)
  dispatch        + full scaffolding, all rows TOP class: every DMA-issue
                  predicate false, cache-hit path — the production cached
                  mix's control flow exactly (isolates predicate cost)
  dispatch_small  + all rows one SMALL class: per-ROI patch DMAs actually
                  fire with double-buffering (adds DMA machinery +
                  transfer on top of the predicates)

Run: python benchmarks/roi_dispatch_probe.py --variant dispatch
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 256
POOL = 7
K = 16
# (py, px) patch classes; last is the TOP (cached full-level) class, as in
# production (_route_and_meta's class table)
CLASSES = [(8, 8), (16, 16), (24, 24), (32, 32)]
TOP_CI = len(CLASSES) - 1
# production combos(): small classes valid at every level, top level only
# ci==0 -> 3*3 + 1 = 10 predicate evaluations per DMA issue
LEVELS = [(256, 256), (128, 128), (64, 64), (32, 32)]


def _combos():
    for lvl, (h, w) in enumerate(LEVELS):
        top = lvl == len(LEVELS) - 1
        for ci, (py, px) in enumerate(CLASSES[:-1]):
            if py > h or px > w:
                continue
            if top and ci != 0:
                continue
            yield lvl, ci, py, px


def kernel(
    meta_ref,  # SMEM [K,1,8]: img, li, cls, yq, x0
    next_ref,  # SMEM [K,1,8]: next chunk's rows (shifted table)
    xint_ref,  # SMEM [K,1,POOL]
    wx_ref,  # SMEM [K,1,POOL]
    geom_ref,  # VMEM [K,POOL,4]
    patch_top,  # VMEM [32, 32*C] resident top patch (bf16)
    feats,  # ANY [B, 128, 128*C] int8 level for the DMA variant
    out_ref,  # VMEM [K, POOL, POOL*C]
    bufs,  # VMEM [2, K, 24, 32*C] int8 double-buffered patch store
    state_ref,  # SMEM [1]
    xb_ref,  # VMEM [32, POOL*C] bf16
    sems,  # DMA [2, K]
    *,
    variant,
):
    g = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(ref, row, j, slot_, py, px):
        img = ref[row, 0, 0]
        yq = ref[row, 0, 3]
        x0 = ref[row, 0, 4]
        return pltpu.make_async_copy(
            feats.at[img, pl.ds(yq * 8, py), pl.ds(x0 * C, px * C)],
            bufs.at[slot_, j, 0:py, 0 : px * C],
            sems.at[slot_, j],
        )

    def start_dmas(ref, slot_):
        for j in range(K):
            li = ref[j, 0, 1]
            cls = ref[j, 0, 2]
            for lvl, ci, py, px in _combos():
                @pl.when((li == lvl) & (cls == ci))
                def _(j=j, py=py, px=px):
                    dma(ref, j, j, slot_, py, px).start()

    if variant != "bare":
        @pl.when(g == 0)
        def _():
            state_ref[0] = -1
            start_dmas(meta_ref, 0)

    slot = jax.lax.rem(g, 2)

    if variant != "bare":
        @pl.when(g + 1 < n)
        def _():
            start_dmas(next_ref, 1 - slot)

    for j in range(K):
        if variant == "bare":
            cls_branches = [(TOP_CI, CLASSES[TOP_CI])]
        else:
            cls = meta_ref[j, 0, 2]

            @pl.when(cls != TOP_CI)
            def _(j=j, slot=slot):
                li = meta_ref[j, 0, 1]
                for lvl, ci, py, px in _combos():
                    @pl.when((li == lvl) & (cls == ci))
                    def _(j=j, py=py, px=px):
                        dma(meta_ref, j, j, slot, py, px).wait()

            @pl.when(cls == TOP_CI)
            def _(j=j):
                img = meta_ref[j, 0, 0]

                @pl.when(state_ref[0] != img)
                def _():
                    # production copies the whole top level here; the cached
                    # mix hits this once per image (~once per 1000 ROIs) so
                    # its transfer cost is negligible — model as state set
                    state_ref[0] = img

            cls_branches = list(enumerate(CLASSES))

        for ci, (py, px) in cls_branches:
            def body(j=j, ci=ci, py=py, px=px, slot=slot):
                if ci == TOP_CI:
                    pref = patch_top
                else:
                    pref = bufs.at[slot, j]
                for q in range(POOL):
                    x0 = xint_ref[j, 0, q]
                    wq = wx_ref[j, 0, q]
                    a = pref[0:py, pl.ds(x0 * C, 2 * C)]
                    if ci != TOP_CI:
                        a = a.astype(jnp.bfloat16)  # int8 codes -> bf16
                    v0 = a[:, 0:C]
                    v1 = a[:, C : 2 * C]
                    xb_ref[0:py, q * C : (q + 1) * C] = (
                        (1.0 - wq) * v0 + wq * v1
                    ).astype(jnp.bfloat16)
                gv = geom_ref[j]
                y0c = gv[:, 0:1].astype(jnp.int32)
                y1c = gv[:, 1:2].astype(jnp.int32)
                wyc = gv[:, 2:3]
                iota = jax.lax.broadcasted_iota(jnp.int32, (POOL, py), 1)
                wy = jnp.where(iota == y0c, 1.0 - wyc, 0.0) + jnp.where(
                    iota == y1c, wyc, 0.0
                )
                out = jax.lax.dot_general(
                    wy.astype(jnp.bfloat16),
                    xb_ref[0:py, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                out_ref[j, :, :] = out.astype(out_ref.dtype)

            if variant == "bare":
                body()
            else:
                pl.when(cls == ci)(body)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--variant", default="dispatch",
        choices=["bare", "dispatch", "dispatch_small"],
    )
    ap.add_argument("--n", type=int, default=96000)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    variant = args.variant

    n = (args.n // K) * K
    rng = np.random.RandomState(0)
    b = 4

    if variant == "dispatch_small":
        li_v, cls_v = 1, 1  # (16,16) patches DMA'd from the 128^2 level
    else:
        li_v, cls_v = 3, TOP_CI
    meta = np.zeros((n, 1, 8), np.int32)
    meta[:, 0, 0] = np.arange(n) * b // n  # image-major
    meta[:, 0, 1] = li_v
    meta[:, 0, 2] = cls_v
    meta[:, 0, 3] = rng.randint(0, (128 - 16) // 8, n)  # yq (*8 row start)
    meta[:, 0, 4] = rng.randint(0, 128 - 17, n)  # x0 col start
    meta_j = jnp.asarray(meta)
    meta_next = jnp.asarray(np.roll(meta, -K, axis=0))

    py_c = CLASSES[cls_v][0]
    xint = jnp.asarray(rng.randint(0, 30, (n, 1, POOL)), jnp.int32)
    wx = jnp.asarray(rng.rand(n, 1, POOL), jnp.float32)
    geom = jnp.asarray(
        np.stack(
            [
                rng.randint(0, py_c - 1, (n, POOL)),
                rng.randint(0, py_c - 1, (n, POOL)),
                rng.rand(n, POOL),
                rng.rand(n, POOL),
            ],
            axis=-1,
        ),
        jnp.float32,
    )
    patch_top = jnp.asarray(rng.rand(32, 32 * C), jnp.bfloat16)
    feats = jnp.asarray(
        rng.randint(-128, 127, (b, 128, 128 * C)), jnp.int8
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n // K,),
        in_specs=[
            pl.BlockSpec((K, 1, 8), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, 1, 8), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, 1, POOL), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, 1, POOL), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, POOL, 4), lambda g: (g, 0, 0)),
            pl.BlockSpec((32, 32 * C), lambda g: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((K, POOL, POOL * C), lambda g: (g, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, K, 24, 32 * C), jnp.int8),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((32, POOL * C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, K)),
        ],
    )
    f = pl.pallas_call(
        functools.partial(kernel, variant=variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, POOL, POOL * C), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )

    @jax.jit
    def run(nn, meta_j, meta_next, xint, wx, geom, patch_top, feats):
        def body(_, carry):
            p, acc = carry
            out = f(meta_j, meta_next, xint, wx, geom, p, feats)
            s = jnp.sum(out[0].astype(jnp.float32))
            return p + (s * 1e-30).astype(p.dtype), acc + s

        return jax.lax.fori_loop(
            0, nn, body, (patch_top, jnp.float32(0))
        )[1]

    a = (meta_j, meta_next, xint, wx, geom, patch_top, feats)
    float(run(jnp.int32(1), *a))
    float(run(jnp.int32(1), *a))
    t0 = time.time(); float(run(jnp.int32(1), *a)); t1 = time.time() - t0
    t0 = time.time()
    float(run(jnp.int32(1 + args.iters), *a))
    tm = time.time() - t0
    ms = 1000.0 * max(tm - t1, 1e-9) / args.iters
    print(
        f"{variant:15s} {ms:8.2f} ms for {n} ROIs "
        f"({1000.0 * ms / n:6.3f} us/ROI)",
        flush=True,
    )


if __name__ == "__main__":
    main()
