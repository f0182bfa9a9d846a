"""Fused int8 ResNet bottleneck block (identity blocks) as one Pallas kernel.

The unfused int8 path (quant.QuantConv ≙ reference fpn.py identity_block,
fpn.py:51-94) runs each bottleneck as three XLA convs with
dequant→BN→relu→requant epilogues between them. Two measured costs remain
(benchmarks/backbone_stage_bench.py, CLAUDE.md):

1. **Lane padding on narrow stages**: stage 2's 64-channel convs pad to 128
   MXU lanes (15.9 ms/b32 vs a 2.3 ms int8 roofline). The 2x2-blocked s2d
   basis was measured and LOSES (4x dense MACs for 2x utilization; 159.7 vs
   166.9 img/s end-to-end).
2. **Intra-block HBM traffic**: the three conv results round-trip through
   HBM between convs even though the 64/128-channel intermediates of a row
   tile fit easily in VMEM.

This kernel runs the whole identity block — 1x1 → BN/relu → 3x3 → BN/relu
→ 1x1 → BN → +shortcut → relu — on an int8 row tile resident in VMEM:

- the 3x3 conv is an im2col matmul: the 9 taps of the (already computed,
  requantized) m1 activation are concatenated on the lane axis into a
  [tile_rows, 9*C1] operand, so the contraction is 9*C1 (>=576) instead of
  C1 — no MXU lane starvation even at C1=64;
- every elementwise epilogue (dequant, folded BN affine, relu, requant to
  the next conv's calibrated activation scale) happens in VMEM registers,
  folded to a single `clip(round(relu(t*alpha + beta)))` per conv via
  host-side scale algebra;
- HBM traffic is exactly one int8 read of the block input tile (+2 halo
  rows) and one int8 write of the output tile, double-buffered behind the
  MXU work.

Layout: activations are viewed [B, H, W*C3] (the same lane-major trick as
ops/roi_align_pallas.py) so the 3x3's x-shifts are static lane slices and
the y-halo is two extra sublane rows. Every ResNet stage here has
W*C3 == 65536 at 1024² inputs, so one tiling serves all stages.

Numerics: identical int8 quantization points as the unfused path (same
act/kernel scales, same round-half-even, same int32 accumulation); the only
difference is that affine epilogues run in f32 instead of the unfused
path's bf16 round-trips, so outputs can differ by ~1 int8 step on values
near a rounding boundary (parity-tested at the detection level).

INFERENCE ONLY (int8, frozen weights). ≙ reference identity_block
semantics (fpn.py:51-94) exactly, up to quantization.

MEASURED END-TO-END LOSER on v5e (2026-08, bench.py --fused-bottleneck:
155.7 vs 191.3 img/s int8 b96) — off by default. The im2col tap
materialization writes 9x the m1 bytes through VPU sublane shifts, and
Mosaic's 8-row DMA alignment rule forces 8-row halos (th+16 input rows
per th-row tile, 1.5x input reads at TH=32). The kernel is kept because
it is correct hardware-validated infrastructure (TPU-vs-interpret parity
<=1 int8 step) and a base for future per-stage fusion experiments; see
benchmarks/fused_block_bench.py for per-stage numbers.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default row-tile height (output rows per grid step). Halo recompute of
# the m1 activation is 2/(th+2); DMA granule is (th+16) * W*C3 bytes int8
# (8-row halos each side: DMA slices must be 8-row aligned on this memref).
# Larger tiles amortize the per-grid-step fixed cost (~1-2 us measured on
# the ROIAlign kernel) at linearly more VMEM scratch.
TH = 32


def pick_tile(h: int) -> int:
    """Largest tile height (<= TH) giving >= 2 tiles, or 0 if unsupported."""
    for th in (TH, 16, 8):
        if h % th == 0 and h // th >= 2:
            return th
    return 0


def fused_block_supported(x8: Array, c1: int) -> bool:
    """Static-shape gate: needs a tileable height with >= 2 row tiles (the
    edge-tile specializations assume first and last tiles are distinct),
    a 128-multiple lane row, and 64-multiple bottleneck channels."""
    if x8.ndim != 4 or x8.dtype != jnp.int8:
        return False
    b, h, w, c3 = x8.shape
    return (
        pick_tile(h) > 0
        and (w * c3) % 128 == 0
        and c1 % 64 == 0
        and w >= 3
    )


def _kernel(
    x_any,  # ANY [B, H, W*C3] int8
    ka,  # VMEM [C3, C1] int8
    kb,  # VMEM [9*C1, C1] int8   (dy, dx, ci)-major rows
    kc,  # VMEM [C1, C3] int8
    alpha_a,  # VMEM f32 [1, C1]: t1 -> m1 requant multiplier
    beta_a,  # VMEM f32 [1, C1]
    alpha_b,  # VMEM f32 [1, C1]
    beta_b,  # VMEM f32 [1, C1]
    alpha_c,  # VMEM f32 [1, C3]: t3 -> out-scale domain multiplier
    beta_c,  # VMEM f32 [1, C3]
    sc_short,  # SMEM f32 [1]: shortcut int8 -> out-scale domain
    out_ref,  # VMEM [1, TH, W*C3] int8
    *scratch,
    w: int,
    c1: int,
    c3: int,
    n_htiles: int,
    th: int,
):
    xbufs, m1_ref, taps_ref, sems = scratch
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    g = bi * n_htiles + ti
    slot = jax.lax.rem(g, 2)

    def dma(slot_, bi_, ti_, start):
        """Copy rows [ti*TH - 8, ti*TH + TH + 8) of image bi_ into the slot.

        The block math needs a 1-row y-halo, but DMA slices of this tiled
        memref must be 8-row aligned in offset AND extent (Mosaic), so the
        halo is 8 rows each side. Buffer row b holds input row
        ti*TH - 8 + b; edge tiles copy TH+8 valid rows and leave the
        out-of-image side stale (it only feeds m1, which is explicitly
        zeroed there to match SAME-conv zero padding).

        `start=False` re-derives the identical descriptors and waits on
        them — waits must match the started copy's shape exactly so the
        semaphore is decremented by the right byte count.
        """
        first = ti_ == 0
        last = ti_ == n_htiles - 1

        def mk(src_row, dst_row, rows):
            cp = pltpu.make_async_copy(
                x_any.at[bi_, pl.ds(src_row, rows)],
                xbufs.at[slot_, pl.ds(dst_row, rows)],
                sems.at[slot_],
            )
            cp.start() if start else cp.wait()

        # offsets are written as explicit 8*(...) products so Mosaic's
        # divisibility prover accepts them (ti*th - 8 alone is rejected)
        t8 = th // 8

        @pl.when(first)
        def _():
            mk(8 * (ti_ * t8), 8, th + 8)

        @pl.when(last)
        def _():
            mk(8 * (ti_ * t8 - 1), 0, th + 8)

        # emitted branches must be statically shape-valid even when their
        # predicate is false: with 2 tiles (both edges) the interior's
        # th+16-row slice can exceed the image, so don't emit it at all
        if n_htiles > 2:

            @pl.when(jnp.logical_not(first | last))
            def _():
                mk(8 * (ti_ * t8 - 1), 0, th + 16)

    @pl.when(g == 0)
    def _():
        dma(slot, bi, ti, start=True)

    @pl.when(g + 1 < pl.num_programs(0) * pl.num_programs(1))
    def _():
        nb = (g + 1) // n_htiles
        nt = (g + 1) - nb * n_htiles
        dma(1 - slot, nb, nt, start=True)

    dma(slot, bi, ti, start=False)  # wait for this tile's copy

    first = ti == 0
    last = ti == n_htiles - 1

    # ---- conv 2a (1x1, C3 -> C1) on the TH+2 rows the block math needs
    # (buffer rows 7..TH+9 = input rows ti*TH-1 .. ti*TH+TH+1)
    x_flat = xbufs[slot, 7 : th + 9, :].reshape((th + 2) * w, c3)
    t1 = jax.lax.dot_general(
        x_flat, ka[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    m1 = jnp.maximum(
        t1.astype(jnp.float32) * alpha_a[0, :] + beta_a[0, :], 0.0
    )
    m1_8 = jnp.round(m1).astype(jnp.int32)  # relu'd: already >= 0
    m1_8 = jnp.minimum(m1_8, 127).astype(jnp.int8)
    # m1 stays in the flattened [(TH+2)*W, C1] matmul layout (Mosaic can't
    # shape-cast int8 vectors whose minor dim is < 128 lanes, so the 2D
    # [TH+2, W*C1] view used pre-r2 fails to compile at C1=64). Written at
    # row offset 1 so every tap slice below has a non-negative start.
    m1_ref[pl.ds(1, (th + 2) * w), :] = m1_8

    # SAME zero padding: out-of-image halo rows of the 3x3's input are zero
    @pl.when(first)
    def _():
        m1_ref[pl.ds(1, w), :] = jnp.zeros((w, c1), jnp.int8)

    @pl.when(last)
    def _():
        m1_ref[pl.ds(1 + (th + 1) * w, w), :] = jnp.zeros((w, c1), jnp.int8)

    # ---- build the 9 im2col taps: [TH*W, 9*C1], (dy, dx, ci)-major.
    # Output pixel f = y*W + x reads m1 logical row (y+dy)*W + (x+dx-1) =
    # f + dy*W + dx - 1, i.e. tap (dy, dx) is the static sublane slice of
    # the flattened m1 starting at dy*W + dx (with the +1 write offset).
    # The x boundary (x+dx-1 outside [0, W)) is masked by pixel position.
    xpos = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (th * w, c1), 0), w
    )
    zero8 = jnp.zeros((th * w, c1), jnp.int8)
    for dy in range(3):
        for dx in range(3):
            t = m1_ref[pl.ds(dy * w + dx, th * w), :]
            if dx == 0:  # reads x-1: invalid at x == 0
                t = jnp.where(xpos == 0, zero8, t)
            elif dx == 2:  # reads x+1: invalid at x == W-1
                t = jnp.where(xpos == w - 1, zero8, t)
            j = dy * 3 + dx
            taps_ref[:, j * c1 : (j + 1) * c1] = t

    # ---- conv 2b (3x3 as one [TH*W, 9C1] x [9C1, C1] matmul) + requant
    t2 = jax.lax.dot_general(
        taps_ref[:, :], kb[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    m2 = jnp.maximum(
        t2.astype(jnp.float32) * alpha_b[0, :] + beta_b[0, :], 0.0
    )
    m2_8 = jnp.minimum(jnp.round(m2).astype(jnp.int32), 127).astype(jnp.int8)

    # ---- conv 2c (1x1, C1 -> C3), shortcut add, relu, out requant
    t3 = jax.lax.dot_general(
        m2_8, kc[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    short = xbufs[slot, 8 : th + 8, :].reshape(th * w, c3).astype(jnp.float32)
    y = jnp.maximum(
        t3.astype(jnp.float32) * alpha_c[0, :]
        + beta_c[0, :]
        + short * sc_short[0],
        0.0,
    )
    y8 = jnp.minimum(jnp.round(y).astype(jnp.int32), 127).astype(jnp.int8)
    out_ref[0, :, :] = y8.reshape(th, w * c3)


def fused_identity_block_int8(
    x8: Array,
    in_scale: Array,
    ka8: Array,  # [1, 1, C3, C1] int8 frozen kernel
    kb8: Array,  # [3, 3, C1, C1]
    kc8: Array,  # [1, 1, C1, C3]
    sw_a: Array,  # [C1] per-channel weight scales
    sw_b: Array,
    sw_c: Array,
    bias_a: Array,  # [C1] conv biases
    bias_b: Array,
    bias_c: Array,
    bn_a: tuple,  # (inv, shift) folded FrozenBatchNorm affines, [C1]
    bn_b: tuple,
    bn_c: tuple,
    scale_b: Array,  # conv 2b's calibrated input act scale (m1's range)
    scale_c: Array,  # conv 2c's calibrated input act scale (m2's range)
    out_scale: Array,  # the block's calibrated output scale
    interpret: bool = False,
) -> Array:
    """Run one int8 identity bottleneck block fused; returns int8 [B,H,W,C3]
    quantized with `out_scale` (the carried-stream contract of
    models/backbone.BottleneckBlock).

    Scale algebra (all folded host-side into one affine per conv):
      conv2a: m1 = relu((t1*sxa*swa + bias_a)*inv_a + shift_a), then
      quantize by 127/scale_b — relu commutes with the positive scale, so
      alpha_a = sxa*swa*inv_a * 127/scale_b, beta_a likewise.
    """
    b, h, w, c3 = x8.shape
    c1 = ka8.shape[-1]
    assert fused_block_supported(x8, c1)
    th = pick_tile(h)

    f32 = lambda v: jnp.asarray(v, jnp.float32)
    qmax = 127.0
    sxa = f32(in_scale) / qmax  # int8 -> float multiplier of the block input
    r_b = qmax / jnp.maximum(f32(scale_b), 1e-30)
    r_c = qmax / jnp.maximum(f32(scale_c), 1e-30)
    r_o = qmax / jnp.maximum(f32(out_scale), 1e-30)

    inv_a, shift_a = (f32(v) for v in bn_a)
    inv_b, shift_b = (f32(v) for v in bn_b)
    inv_c, shift_c = (f32(v) for v in bn_c)

    alpha_a = (sxa * f32(sw_a) * inv_a * r_b)[None, :]
    beta_a = (((f32(bias_a)) * inv_a + shift_a) * r_b)[None, :]
    sxb = f32(scale_b) / qmax
    alpha_b = (sxb * f32(sw_b) * inv_b * r_c)[None, :]
    beta_b = ((f32(bias_b) * inv_b + shift_b) * r_c)[None, :]
    sxc = f32(scale_c) / qmax
    alpha_c = (sxc * f32(sw_c) * inv_c * r_o)[None, :]
    beta_c = ((f32(bias_c) * inv_c + shift_c) * r_o)[None, :]
    sc_short = (sxa * r_o)[None]

    # kernel operand layouts: 1x1s as [Ci, Co]; the 3x3 as [9*C1, C1] rows
    # in (dy, dx, ci)-major order to match the kernel's tap concatenation
    ka = ka8.reshape(c3, c1)
    kb = kb8.reshape(9 * c1, c1)  # [3,3,C1,C1] is already (dy, dx, ci)-major
    kc = kc8.reshape(c1, c3)

    n_htiles = h // th
    grid = (b, n_htiles)

    vec_spec = lambda n: pl.BlockSpec((1, n), lambda bi, ti: (0, 0))
    out = pl.pallas_call(
        functools.partial(
            _kernel, w=w, c1=c1, c3=c3, n_htiles=n_htiles, th=th
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # x view [B, H, W*C3]
                pl.BlockSpec((c3, c1), lambda bi, ti: (0, 0)),
                pl.BlockSpec((9 * c1, c1), lambda bi, ti: (0, 0)),
                pl.BlockSpec((c1, c3), lambda bi, ti: (0, 0)),
                vec_spec(c1),
                vec_spec(c1),
                vec_spec(c1),
                vec_spec(c1),
                vec_spec(c3),
                vec_spec(c3),
                pl.BlockSpec(
                    (1,), lambda bi, ti: (0,), memory_space=pltpu.SMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, th, w * c3), lambda bi, ti: (bi, ti, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, th + 16, w * c3), jnp.int8),  # x tiles
                # m1 (requantized), flattened rows + 1 lead row so tap
                # slices start at dy*w+dx >= 0 (+ tail slack to sublanes)
                pltpu.VMEM(((th + 2) * w + 8, c1), jnp.int8),
                pltpu.VMEM((th * w, 9 * c1), jnp.int8),  # im2col taps
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w * c3), jnp.int8),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(
        x8.reshape(b, h, w * c3),
        ka,
        kb,
        kc,
        alpha_a,
        beta_a,
        alpha_b,
        beta_b,
        alpha_c,
        beta_c,
        sc_short,
    )
    return out.reshape(b, h, w, c3)
