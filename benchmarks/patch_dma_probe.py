"""Can per-ROI patch DMA beat the XLA gather for ROIAlign on v5e?

ROIAlign via XLA row-gather runs at the gather engine's ~147M rows/s
(512 B rows) — 6.27M corner rows ≈ 43 ms at batch 32. Each ROI's 7x7
bilinear samples live inside a ≤16² patch of ONE pyramid level, so a Pallas
kernel can instead DMA one [16, 16, C] patch per ROI (32k DMAs, ~4.2 GB)
and interpolate in VMEM. This probe measures ONLY the DMA side: grid over N
ROIs, double-buffered async patch copies from a [32, 256, 256, 256] bf16
HBM array at scalar-prefetched offsets, trivial consume.

If this lands well under the 43 ms gather, the full kernel is worth
building.
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


def make_probe(n_rois: int, patch: int, chans: int, src_shape):
    def kernel(i_ref, y_ref, xq_ref, src_ref, out_ref, scratch, sems):
        g = pl.program_id(0)
        n = pl.num_programs(0)
        slot = jax.lax.rem(g, 2)
        nslot = 1 - slot

        def copy(step, slot_):
            i = i_ref[step]
            y = y_ref[step]
            xq = xq_ref[step]  # x offset / 8: the in-kernel *8 makes
            # 8-divisibility of the tiled-dim offset provable to Mosaic
            return pltpu.make_async_copy(
                src_ref.at[i, pl.ds(y, patch), pl.ds(xq * 8, patch), :],
                scratch.at[slot_],
                sems.at[slot_],
            )

        @pl.when(g == 0)
        def _():
            copy(0, 0).start()
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when(g + 1 < n)
        def _():
            copy(g + 1, nslot).start()

        copy(g, slot).wait()
        out_ref[0, :] += scratch[slot, 0, 0, :].astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_rois,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, patch, patch, chans), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, chans), jnp.float32),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    b, h, w, c = 32, 256, 256, 256
    key = jax.random.PRNGKey(0)
    src = jax.jit(
        lambda k: jax.random.normal(k, (b, h, w, c), jnp.float32).astype(
            jnp.bfloat16
        )
    )(key)

    for n_rois, patch in [(32000, 16), (32000, 8), (3200, 32)]:
        ks = jax.random.fold_in(key, patch * n_rois)
        scal = jax.jit(
            lambda k: (
                jax.random.randint(k, (n_rois,), 0, b, jnp.int32),
                jax.random.randint(
                    jax.random.fold_in(k, 1), (n_rois,), 0, h - patch,
                    jnp.int32,
                ),
                # stored as x/8 (see kernel comment on tiled-dim offsets)
                jax.random.randint(
                    jax.random.fold_in(k, 2), (n_rois,), 0,
                    (w - patch) // 8, jnp.int32,
                ),
            )
        )(ks)

        probe = make_probe(n_rois, patch, c, src.shape)

        @jax.jit
        def run(n, scal, src):
            def body(_, carry):
                (si, sy, sx), acc = carry
                out = probe(si, sy, sx, src)
                s = jnp.sum(out)
                r = (s.astype(jnp.int32) & 3) + 1
                return (
                    (jnp.roll(si, r), jnp.roll(sy, r), jnp.roll(sx, r)),
                    acc + s,
                )
            return jax.lax.fori_loop(0, n, body, (scal, jnp.float32(0)))[1]

        float(run(jnp.int32(1), scal, src))
        t0 = time.time(); float(run(jnp.int32(1), scal, src)); t1 = time.time() - t0
        t0 = time.time()
        float(run(jnp.int32(1 + args.iters), scal, src))
        tm = time.time() - t0
        dt = max(tm - t1, 1e-9) / args.iters
        bytes_ = n_rois * patch * patch * c * 2
        print(
            f"rois={n_rois:6d} patch={patch:3d}  {dt * 1e3:8.2f} ms  "
            f"{n_rois / dt / 1e6:6.2f} M dma/s  "
            f"{bytes_ / dt / 1e9:6.1f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
