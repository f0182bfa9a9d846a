"""Ablate the per-ROI inner loop of the Pallas ROIAlign kernel.

The k-probe showed the all-top-class (cached patch, zero DMA) mix still
costs ~0.74 us/ROI — pure per-ROI compute/serialization. This isolates
which component dominates with standalone kernels that mimic the inner
loop on ONE VMEM-resident [32, 32*C] patch:

  full      7 dynamic lane-slice x-blends -> xb, [7,32]@[32,7C] wy matmul
  static_x  same but static x offsets (is dynamic-slice addressing the cost?)
  wide2c    ONE 2C-wide dynamic slice per output col instead of two C-wide
  nomatmul  x-blend only, out = xb rows (is the MXU matmul the cost?)
  noblend   matmul only on a fixed xb (is the x-blend the cost?)
  pair2     two ROIs per matmul via block-diag wy ([14,64]@[64,7C])

Run:  python benchmarks/roi_inner_probe.py --variant full
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
PY = 32  # top-level patch rows
PX = 32
POOL = 7
K = 16  # ROIs per grid step


def kernel(xint_ref, wx_ref, geom_ref, patch_ref, out_ref, xb_ref, *, variant):
    k_pairs = K // 2 if variant == "pair2" else K
    for j in range(K):
        if variant == "noblend":
            pass  # xb_ref holds garbage — timing only
        else:
            for q in range(POOL):
                if variant == "static_x":
                    x0 = q * 4
                    x1 = q * 4 + 1
                else:
                    x0 = xint_ref[j, 0, q]
                    x1 = xint_ref[j, 0, POOL + q]
                wq = wx_ref[j, 0, q]
                if variant == "wide2c":
                    a = patch_ref[0:PY, pl.ds(x0 * C, 2 * C)]
                    v0 = a[:, 0:C]
                    v1 = a[:, C : 2 * C]
                else:
                    v0 = patch_ref[0:PY, pl.ds(x0 * C, C)]
                    v1 = patch_ref[0:PY, pl.ds(x1 * C, C)]
                xb_ref[0:PY, q * C : (q + 1) * C] = (
                    (1.0 - wq) * v0 + wq * v1
                ).astype(jnp.bfloat16)

        if variant == "nomatmul":
            out_ref[j, :, :] = xb_ref[0:POOL, :]
            continue
        if variant == "pair2":
            if j % 2 == 0:
                continue
            gv = geom_ref[j]
            y0c = gv[:, 0:1].astype(jnp.int32)
            y1c = gv[:, 1:2].astype(jnp.int32)
            wyc = gv[:, 2:3]
            iota = jax.lax.broadcasted_iota(jnp.int32, (2 * POOL, PY), 1)
            y0c2 = jnp.concatenate([y0c, y0c], 0)
            y1c2 = jnp.concatenate([y1c, y1c], 0)
            wyc2 = jnp.concatenate([wyc, wyc], 0)
            wy = jnp.where(iota == y0c2, 1.0 - wyc2, 0.0) + jnp.where(
                iota == y1c2, wyc2, 0.0
            )
            # NOTE: timing-shape proxy — both halves read the same xb
            out = jax.lax.dot_general(
                wy.astype(jnp.bfloat16),
                xb_ref[0:PY, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[j - 1, :, :] = out[0:POOL, :].astype(out_ref.dtype)
            out_ref[j, :, :] = out[POOL : 2 * POOL, :].astype(out_ref.dtype)
            continue

        gv = geom_ref[j]
        y0c = gv[:, 0:1].astype(jnp.int32)
        y1c = gv[:, 1:2].astype(jnp.int32)
        wyc = gv[:, 2:3]
        iota = jax.lax.broadcasted_iota(jnp.int32, (POOL, PY), 1)
        wy = jnp.where(iota == y0c, 1.0 - wyc, 0.0) + jnp.where(
            iota == y1c, wyc, 0.0
        )
        out = jax.lax.dot_general(
            wy.astype(jnp.bfloat16),
            xb_ref[0:PY, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[j, :, :] = out.astype(out_ref.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="full")
    ap.add_argument("--n", type=int, default=96000)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    variant = args.variant

    n = (args.n // K) * K
    rng = np.random.RandomState(0)
    xint = jnp.asarray(
        np.concatenate(
            [
                rng.randint(0, PX - 1, (n, 1, POOL)),
                rng.randint(0, PX - 1, (n, 1, POOL)),
            ],
            axis=2,
        ),
        jnp.int32,
    )
    wx = jnp.asarray(rng.rand(n, 1, POOL), jnp.float32)
    geom = jnp.asarray(
        np.stack(
            [
                rng.randint(0, PY - 1, (n, POOL)),
                rng.randint(0, PY - 1, (n, POOL)),
                rng.rand(n, POOL),
                rng.rand(n, POOL),
            ],
            axis=-1,
        ),
        jnp.float32,
    )
    patch = jnp.asarray(rng.rand(PY, PX * C), jnp.bfloat16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n // K,),
        in_specs=[
            pl.BlockSpec((K, 1, 2 * POOL), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, 1, POOL), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, POOL, 4), lambda g: (g, 0, 0)),
            pl.BlockSpec((PY, PX * C), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((K, POOL, POOL * C), lambda g: (g, 0, 0)),
        scratch_shapes=[pltpu.VMEM((PY, POOL * C), jnp.bfloat16)],
    )
    f = pl.pallas_call(
        functools.partial(kernel, variant=variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, POOL, POOL * C), jnp.bfloat16),
    )

    @jax.jit
    def run(nn, xint, wx, geom, patch):
        def body(_, carry):
            p, acc = carry
            out = f(xint, wx, geom, p)
            s = jnp.sum(out[0].astype(jnp.float32))
            return p + (s * 1e-30).astype(p.dtype), acc + s

        return jax.lax.fori_loop(0, nn, body, (patch, jnp.float32(0)))[1]

    float(run(jnp.int32(1), xint, wx, geom, patch))
    float(run(jnp.int32(1), xint, wx, geom, patch))
    t0 = time.time(); float(run(jnp.int32(1), xint, wx, geom, patch)); t1 = time.time() - t0
    t0 = time.time()
    float(run(jnp.int32(1 + args.iters), xint, wx, geom, patch))
    tm = time.time() - t0
    ms = 1000.0 * max(tm - t1, 1e-9) / args.iters
    print(
        f"{variant:10s} {ms:8.2f} ms for {n} ROIs "
        f"({1000.0 * ms / n:6.3f} us/ROI)",
        flush=True,
    )


if __name__ == "__main__":
    main()
