"""Pallas TPU multilevel ROIAlign: per-ROI patch DMA + bilinear-as-matmul.

The XLA formulation (`ops/roi_align.py`) is bound by the TPU gather engine's
row RATE (~147M 512B-rows/s measured, and the rate FALLS as rows widen —
benchmarks/gather_width_probe.py), so batch-32 box pooling costs ~46 ms for
6.27M single-pixel corner gathers. But each ROI's pool-grid samples live
inside one small bounding patch of ONE pyramid level, so this kernel instead:

1. DMAs each ROI's bounding patch HBM→VMEM in ONE async copy (double
   buffered across grid steps; ~390-570 GB/s measured,
   benchmarks/patch_dma_probe.py),
2. applies the x-interpolation with ONE 2C-wide dynamic lane-slice of the
   PATCH per output column (offsets are multiples of C, so always
   lane-aligned; the two corner pixels are adjacent by host construction,
   edge clamps folding into the blend weight), producing [py, pool*C],
3. applies the y-interpolation as a [pool, py] x [py, pool*C] MXU matmul
   (the bilinear weight matrix has the two corner weights per row).
   x-first matters: y-first computed px*C matmul columns of which only
   pool*C were ever read — 3-8x wasted MXU latency per ROI (measured
   0.85-0.93 us/ROI y-first vs ~0.5 x-first, benchmarks/roi_align_k_probe).

Each grid step processes K_ROIS ROIs: per-step fixed costs (the SMEM/VMEM
input-block DMAs and grid overhead, ~1.2 us/step measured at K=1) amortize
across K patches that are all in flight concurrently.

Mosaic constraints honored: features are viewed [B, H, W*C] so x-slices are
lane-dim slices (any pixel offset is x*C, provably 128-divisible); y (the
sublane dim) offsets are pre-aligned to 8 on the host; no transposes; no
value-level dynamic slicing (only ref `pl.ds`); patch classes have static
shapes with `pl.when`-predicated DMAs (every emitted branch must be
shape-valid even when predicated off); int32 iota only; scalar weights read
from SMEM ([1,1]-vector broadcasts over two dims don't lower).

INFERENCE ONLY: `pallas_call` has no JVP rule, and boxes must already be
clipped to [0, 1] (the proposal/detection layers guarantee this). Training
paths keep the XLA version.

≙ reference semantics: `tf.image.crop_and_resize` bilinear pooling with the
FPN level-assignment rule (maskrcnn.py:104-122), identical to
`batched_multilevel_roi_align` (parity-tested in
tests/test_roi_align_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from objectdetection_tpu.ops.roi_align import roi_levels

# Patch classes (py, px): py covers the 8-aligned y-span, px the exact
# x-span. The FPN assignment rule bounds sqrt(h*w)/stride to [9.9, 19.8]
# for non-clamped ROIs, but each SIDE scales with sqrt(aspect): at aspect 4
# a side reaches ~41 level pixels. Four aspect-aware classes cover that
# envelope (ROIs pick the cheapest fitting patch); top-level-clamped ROIs
# get a fifth full-top-level class (computed per call, cached per image).
# Pathological aspect ratios beyond the envelope fall back to the big class
# with host-side corner clamping (approximate, never out of bounds).
_SMALL = (24, 24)
_WIDE = (24, 44)
_TALL = (48, 24)
_BIG = (48, 44)
# strip classes for ZERO-AREA boxes (proposals clipped flat against the
# window, whose parity level is the finest — roi_levels): their sample
# extent in the flat dim is <= 2 px, so a narrow strip patch covers them
# at a fraction of BIG's DMA bytes. Without these, the random-weight
# bench's flood of flat survivors fell through to BIG at level 2
# (~1.1 MB bf16 per ROI, measured -25 img/s).
_FLATX = (48, 4)  # flat in x: tall 4-px strip (x extent of a flat box <= 2)
_FLATY = (8, 44)  # flat in y: short wide strip
# index 0 must stay a top-level-valid class (the top-level dispatch rule
# below); preference among fitting classes is by patch AREA, not index
_NONTOP_CLASSES = (_SMALL, _FLATX, _FLATY, _WIDE, _TALL, _BIG)

K_ROIS = 16  # ROIs per grid step. b96 sweep (roi_align_k_probe, x-first
# kernel): realistic ROI-size mix 82.0 @K=8 / 70.5 @K=16 / 69.4 @K=24;
# degenerate all-huge mix flat at ~71 for K 8-24. K=16 takes the realistic
# win at half K=24's VMEM scratch.


def pallas_roi_align_supported(features) -> bool:
    """Static patch classes need non-top levels >= BIG and a top level that
    fits the small and full-level classes."""
    hs = [f.shape[1] for f in features]
    ws = [f.shape[2] for f in features]
    return (
        min(hs[:-1]) >= _BIG[0]
        and min(ws[:-1]) >= _BIG[1]
        and hs[-1] >= _SMALL[0]
        and hs[-1] % 8 == 0
        and ws[-1] >= _SMALL[1]
        # x patch offsets are lane offsets x*C — must stay 128-aligned
        and features[0].shape[-1] % 128 == 0
    )


def _kernel(
    meta_ref,  # SMEM int32 [M*K, 1, 8] this step's rows: img, li, cls, y0a/8, x0a
    next_ref,  # SMEM int32 [M*K, 1, 8] rows shifted by K (next CHUNK's meta)
    flag_ref,  # SMEM int32 [M, 1, 1]: 1 if chunk m has any non-sentinel row
    flag_next_ref,  # SMEM int32 [M, 1, 1]: 1 if chunk m+1 has any
    # patch-DMA-class row (top/sentinel rows never issue patch DMAs)
    xint_ref,  # SMEM int32 [M*K, 1, 2*pool]: x0w | unused (patch-relative)
    wx_ref,  # SMEM f32 [M*K, 1, pool]: adjusted x lerp weights (scalar reads)
    geom_ref,  # VMEM f32 [M*K, pool, 4]: per-sample y0r, y1r, wy, (wx unused)
    post_ref,  # VMEM f32 [pool, pool*C] epilogue multiply map — 127/s_out
    # (int8 out), s_in/127 (int8 in, float out), s_in/s_out (both) — or
    # [1, 1] when unused (float in, float out)
    f2, f3, f4, f5,  # ANY [B, H_l, W_l*C] feature views
    out_ref,  # VMEM [M*K, pool, pool*C]
    *scratch,
    pool: int,
    chans: int,
    classes,
    level_dims,
    compute_dtype,
    quantize_out: bool,
    int8_in: bool,
    k_rois: int,
    m_chunks: int,
    skip_chunks: bool,
):
    """Each grid step covers m_chunks*k_rois ROIs; the manual patch
    double-buffer stays at K granularity (chunk c's patches were started by
    chunk c-1 into slot c%2). m_chunks > 1 amortizes the per-step fixed
    costs — the 5 pipelined input-block copies and grid overhead, measured
    ~1.2-1.9 us/step — across M chunks (config.align_step_rois); with
    m_chunks == 1 the lowering is the original per-step form (all row
    indices static).

    `skip_chunks` (config.align_skip_chunks) gates, per chunk, (a) the
    DMA-issue loop on a precomputed any-DMA-class flag — all-top chunks
    (e.g. the degenerate bench mix) and sentinel tails have nothing to
    prefetch — and (b) per-ROI processing on an any-real flag:
    all-sentinel chunks (contiguous zero-padding tails — the majority on
    sparse images) pay ONE predicate instead of ~20*K scalar `pl.when`
    evaluations. Output rows of skipped chunks stay unwritten, exactly as
    sentinel rows always were — the caller's zero-row overwrite makes the
    result bit-identical with the gate off."""
    bufs, b_top, state_ref, xb_ref, sems, sem_top = scratch
    feats = (f2, f3, f4, f5)
    g = pl.program_id(0)
    n = pl.num_programs(0)

    top_ci = len(classes) - 1

    def combos():
        """(lvl, ci) pairs that are both shape-valid and reachable. Every
        emitted branch must be statically shape-valid even when its
        predicate is false; the full-top-level class is handled by the
        per-image cache, and top-level ROIs only ever use SMALL or it."""
        for lvl, (h, w) in enumerate(level_dims):
            top = lvl == len(level_dims) - 1
            for ci, (py, px) in enumerate(classes[:-1]):
                if py > h or px > w:
                    continue
                if top and ci != 0:
                    continue
                yield lvl, ci, py, px

    def dma(ref, row, j, slot_, lvl, py, px):
        img = ref[row, 0, 0]
        yq = ref[row, 0, 3]
        x0 = ref[row, 0, 4]
        return pltpu.make_async_copy(
            feats[lvl].at[
                img, pl.ds(yq * 8, py), pl.ds(x0 * chans, px * chans)
            ],
            bufs.at[slot_, j, 0:py, 0 : px * chans],
            sems.at[slot_, j],
        )

    def start_dmas(ref, base, slot_):
        for j in range(k_rois):
            row = base + j
            li = ref[row, 0, 1]
            cls = ref[row, 0, 2]
            for lvl, ci, py, px in combos():
                @pl.when((li == lvl) & (cls == ci))
                def _(row=row, j=j, lvl=lvl, py=py, px=px):
                    dma(ref, row, j, slot_, lvl, py, px).start()

    def wait_dma(ref, row, j, slot_):
        li = ref[row, 0, 1]
        cls = ref[row, 0, 2]
        for lvl, ci, py, px in combos():
            @pl.when((li == lvl) & (cls == ci))
            def _(row=row, j=j, lvl=lvl, py=py, px=px):
                dma(ref, row, j, slot_, lvl, py, px).wait()

    @pl.when(g == 0)
    def _():
        state_ref[0] = -1  # no image's top level cached yet
        start_dmas(meta_ref, 0, 0)

    def chunk(m):
        """One K-ROI chunk: prefetch chunk c+1's patches (next_ref is the
        meta table shifted by K, so rows [m*K, (m+1)*K) of it ARE the next
        chunk — uniformly across step boundaries), then wait + process this
        chunk. m is a Python int when m_chunks == 1, else a fori_loop
        index (dynamic row indices into the step's SMEM/VMEM blocks)."""
        base = m * k_rois
        c = g * m_chunks + m
        slot = jax.lax.rem(c, 2)

        start_pred = c + 1 < n * m_chunks
        if skip_chunks:
            # next chunk has NO patch-DMA-class row (all sentinel and/or
            # cached-top rows — the latter are the ENTIRE degenerate bench
            # mix): nothing to prefetch — skip the K*~10 issue predicates
            # entirely (flag_next is the any-DMA flag, not any-real)
            start_pred = start_pred & (flag_next_ref[m, 0, 0] != 0)

        @pl.when(start_pred)
        def _():
            start_dmas(next_ref, base, 1 - slot)

        def process_rows():
            for j in range(k_rois):
                row = base + j
                cls = meta_ref[row, 0, 2]

                @pl.when(cls != top_ci)
                def _(row=row, j=j, slot=slot):
                    wait_dma(meta_ref, row, j, slot)

                # Full-top-level class: the patch is image i's ENTIRE top
                # pyramid level, cached across grid steps — ROIs arrive
                # image-major, so it reloads only B times per batch instead of
                # once per top-class ROI.
                @pl.when(cls == top_ci)
                def _(row=row):
                    img = meta_ref[row, 0, 0]

                    @pl.when(state_ref[0] != img)
                    def _():
                        cp = pltpu.make_async_copy(
                            feats[len(level_dims) - 1].at[img], b_top, sem_top
                        )
                        cp.start()
                        cp.wait()
                        state_ref[0] = img

                for ci, (py, px) in enumerate(classes):
                    if ci == top_ci:
                        patch_ref_fn = lambda: b_top
                    else:
                        patch_ref_fn = lambda j=j, slot=slot: bufs.at[slot, j]

                    @pl.when(cls == ci)
                    def _(row=row, ci=ci, py=py, px=px,
                          patch_ref_fn=patch_ref_fn):
                        # x-interp FIRST: of the patch's px*C columns, the 7x7
                        # pool only ever reads pool*C blended ones —
                        # interpolating x on the patch (7 lane-slice blends of
                        # [py, C]) before the matmul means the y-matmul
                        # contracts py into pool*C lanes instead of px*C: 3-8x
                        # less MXU work per ROI. (Measured on the y-first
                        # order: 0.85-0.93 us/ROI flat across ROI-size mixes —
                        # MXU latency-bound on wasted columns,
                        # benchmarks/roi_align_k_probe.py.) Separable bilinear
                        # is order-independent; the bf16 round-trip below
                        # matches the XLA path's blend-in-feature-dtype.
                        pref = patch_ref_fn()
                        for q in range(pool):
                            # ONE 2C-wide dynamic lane slice per output column
                            # instead of two C-wide ones: x1 == x0w + 1 by host
                            # construction (edge clamps fold into the adjusted
                            # weight — see _route_and_meta's x0w/wx_adj
                            # derivation, exact for every row). Halves the
                            # dynamic-slice ops and SMEM scalar reads in the
                            # per-ROI hot loop.
                            x0 = xint_ref[row, 0, q]
                            wq = wx_ref[row, 0, q]  # scalar (adjusted weight)
                            a = pref[0:py, pl.ds(x0 * chans, 2 * chans)]
                            if int8_in:
                                # int8 patches: blend the RAW codes (ints <= 128
                                # are exact in bf16); the s_in/127 dequant is
                                # linear so it rides the post map after the
                                # y-matmul instead.
                                a = a.astype(compute_dtype)
                            v0 = a[:, 0:chans]
                            v1 = a[:, chans : 2 * chans]
                            xb_ref[0:py, q * chans : (q + 1) * chans] = (
                                (1.0 - wq) * v0 + wq * v1
                            ).astype(compute_dtype)

                        # Wy [pool, py]: row p has (1-wy_p) at y0r_p and wy_p at
                        # y1r_p, built in ONE vectorized iota-compare expression
                        # from the [pool, 1]-oriented geometry columns (f32
                        # equality on small ints is exact). When y0r==y1r (edge
                        # clamp) the weights sum to 1, matching the XLA path's
                        # v*(1-w) + v*w == v.
                        gv = geom_ref[pl.ds(row, 1), :, :][0]  # [pool, 4]
                        y0c = gv[:, 0:1].astype(jnp.int32)
                        y1c = gv[:, 1:2].astype(jnp.int32)
                        wyc = gv[:, 2:3]
                        iota = jax.lax.broadcasted_iota(jnp.int32, (pool, py), 1)
                        wy_mat = jnp.where(
                            iota == y0c, 1.0 - wyc, 0.0
                        ) + jnp.where(iota == y1c, wyc, 0.0)
                        out = jax.lax.dot_general(
                            wy_mat.astype(compute_dtype),
                            xb_ref[0:py, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # [pool, pool*C]
                        if quantize_out:
                            # int8 epilogue: quantize with the consumer head's
                            # calibrated scales (pre-inverted on the host; with
                            # int8 inputs the map also carries the s_in dequant:
                            # round(codes * s_in/s_out)). The bf16 round-trip
                            # first reproduces the XLA path's pooled-tensor
                            # dtype, so for float inputs int8 codes match the
                            # quantize_act(pooled_bf16) result bit-for-bit.
                            v = out.astype(compute_dtype).astype(jnp.float32)
                            qv = jnp.clip(
                                jnp.round(v * post_ref[:, :]), -128.0, 127.0
                            )
                            out_ref[pl.ds(row, 1), :, :] = qv.astype(jnp.int8)[
                                None
                            ]
                        elif int8_in:
                            # float output of int8 inputs: deferred dequant
                            out_ref[pl.ds(row, 1), :, :] = (
                                out * post_ref[:, :]
                            ).astype(out_ref.dtype)[None]
                        else:
                            out_ref[pl.ds(row, 1), :, :] = out.astype(
                                out_ref.dtype
                            )[None]

        if skip_chunks:
            # all-sentinel chunk: one predicate instead of ~20*K —
            # its out rows stay unwritten (overwritten by the caller's
            # zero-row select, as sentinel rows always are)
            pl.when(flag_ref[m, 0, 0] != 0)(process_rows)
        else:
            process_rows()

    if m_chunks == 1:
        chunk(0)  # original static-index lowering
    else:
        def body(m, carry):
            chunk(m)
            return carry

        jax.lax.fori_loop(0, m_chunks, body, jnp.int32(0))


def _route_and_meta(boxes, image_shape, heights, widths, pool, min_level, b, r):
    """Level assignment, zero-row shortcut, the no_fit coarse-level reroute,
    patch-class selection, and the kernel meta/geometry arrays.

    Pure shape math (no pallas_call) so the routing decisions — in
    particular WHICH rows get `no_fit=True` and sample from the cached top
    level — are pinned by a CPU unit test
    (tests/test_roi_align_pallas.py::TestNoFitReroute).

    Returns a dict with the kernel inputs (meta/xint/wx/geom), the zero-row
    mask, the per-row routing decisions (li/cls/no_fit), and the patch-class
    table.
    """
    n = b * r
    num_levels = len(heights)

    boxes = jax.lax.stop_gradient(boxes)
    lvl = roi_levels(
        boxes,
        image_area=float(image_shape[0] * image_shape[1]),
        min_level=min_level,
        max_level=min_level + num_levels - 1,
    )  # [B, R]
    li = (lvl - min_level).reshape(n)
    bx_flat = boxes.reshape(n, 4)
    # ALL-ZERO boxes (the proposal/detection zero-padding rows — often the
    # majority on sparse images: the random-weight bench carries ~576 of
    # 1000) pool to a CONSTANT per image: every bilinear sample sits at
    # exactly (0, 0) of the finest level, so pooled == features[0][img,0,0].
    # Pooling them per-ROI at level 2 costs the full per-step patch-DMA
    # overhead (measured +67 ms/batch96 when the roi_levels parity fix
    # moved them off the cached top level) — route them through the cheap
    # cached top-level class instead and overwrite their output with the
    # exact value afterwards.
    # Their pooled value is computed EXACTLY outside the kernel
    # (features[0][img, 0, 0] broadcast), so inside the kernel they get the
    # sentinel skip class: no DMA, no blend, no matmul — their out rows stay
    # whatever the buffer held and are overwritten by the zero_row select
    # below. On the random-weight bench mix this skips ~58% of all rows.
    zero_row = jnp.all(bx_flat == 0.0, axis=1)  # [N]
    li = jnp.where(zero_row, num_levels - 1, li)

    bx = boxes.reshape(n, 4)
    y1, x1, y2, x2 = bx[:, 0], bx[:, 1], bx[:, 2], bx[:, 3]

    def grid_coords(p, lo, hi, size):
        steps = jnp.arange(p, dtype=jnp.float32)
        sizef = size.astype(jnp.float32)[:, None]
        if p > 1:
            return lo[:, None] * (sizef - 1) + steps[None, :] * (
                (hi - lo)[:, None] * (sizef - 1) / (p - 1)
            )
        return 0.5 * (lo + hi)[:, None] * (sizef - 1)

    def corners(coord, size):
        i0 = jnp.floor(coord)
        w = coord - i0
        i0 = jnp.clip(i0.astype(jnp.int32), 0, size[:, None] - 1)
        i1 = jnp.minimum(i0 + 1, size[:, None] - 1)
        return i0, i1, w

    # classes: aspect-aware (small/wide/tall/big + flat strips) +
    # full-top-level last
    top_class = (int(heights[-1]), int(widths[-1]))
    classes = _NONTOP_CLASSES + (top_class,)
    top_ci = len(classes) - 1

    def geometry(li):
        lh = jnp.take(jnp.asarray(heights), li)  # [N]
        lw = jnp.take(jnp.asarray(widths), li)
        ys = grid_coords(pool, y1, y2, lh)  # [N, pool], in [0, lh-1]
        xs = grid_coords(pool, x1, x2, lw)
        y0i, y1i, wy = corners(ys, lh)
        x0i, x1i, wx = corners(xs, lw)
        # grid coords are monotonic
        return lh, lw, y0i, y1i, wy, x0i, x1i, wx

    def class_fits(lh, lw, y0i, y1i, x0i, x1i):
        """Per-class 8-aligned y origin / exact x origin (x offsets are
        lane-dim slices of the [B, H, W*C] view, so any pixel origin is
        legal) + whether the ROI's sample extent fits the patch."""
        y_start, y_end = y0i[:, 0], y1i[:, -1]
        x_start, x_end = x0i[:, 0], x1i[:, -1]
        origins, fits = [], []
        for py_k, px_k in classes:
            y0a_k = jnp.clip((y_start // 8) * 8, 0, lh - py_k)
            x0a_k = jnp.clip(x_start, 0, lw - px_k)
            fit_k = (y_end - y0a_k <= py_k - 1) & (
                x_end - x0a_k <= px_k - 1
            )
            origins.append((y0a_k, x0a_k))
            fits.append(fit_k)
        return origins, fits

    lh, lw, y0i, y1i, wy, x0i, x1i, wx = geometry(li)
    origins, fits = class_fits(lh, lw, y0i, y1i, x0i, x1i)

    # Pathological-extent ROIs (near-zero area but huge span — e.g. the
    # window-edge slivers the parity-exact roi_levels rule sends to the
    # finest level) fit NO patch class there. They used to be corner-
    # clamped into BIG — the costliest DMA class AND an approximation.
    # Sample them from the cached full top level instead: exact sampling
    # of a coarser level — a better-behaved approximation than clamping,
    # and nearly free (the top map is cached per image). The XLA gather
    # path (CPU, goldens, eval, pallas_roi_align="off") remains
    # reference-exact for every row.
    any_fit = fits[0]
    for f_k in fits[1:-1]:
        any_fit = any_fit | f_k
    no_fit = ~any_fit & (li < num_levels - 1)
    li = jnp.where(no_fit, num_levels - 1, li)
    is_top = li == num_levels - 1
    lh, lw, y0i, y1i, wy, x0i, x1i, wx = geometry(li)
    origins, fits = class_fits(lh, lw, y0i, y1i, x0i, x1i)

    # cheapest (smallest-area) fitting class wins; top-level ROIs may only
    # use SMALL (k == 0, the one class every top level fits) or the
    # full-top-level class; non-top fallback is BIG (with corner clamping)
    big_ci = _NONTOP_CLASSES.index(_BIG)
    cls = jnp.where(is_top, top_ci, big_ci)
    by_cost_desc = sorted(
        range(len(_NONTOP_CLASSES)),
        key=lambda k: _NONTOP_CLASSES[k][0] * _NONTOP_CLASSES[k][1],
        reverse=True,
    )
    for k in by_cost_desc:
        allowed = fits[k] & (~is_top | (k == 0))
        cls = jnp.where(allowed, k, cls)

    # zero-padding rows: sentinel class -1 matches NO kernel branch (no
    # patch DMA, no blend, no matmul); their outputs are overwritten with
    # the exact corner value by the caller. select() below still picks a
    # benign origin/patch-bound row for them (top class: cls==-1 falls
    # through to per_class[-1]).
    cls = jnp.where(zero_row, -1, cls)

    def select(per_class):
        out = per_class[-1]
        for k in range(len(classes) - 2, -1, -1):
            out = jnp.where(cls == k, per_class[k], out)
        return out

    y0a = select([o[0] for o in origins])
    x0a = select([o[1] for o in origins])
    # patch bounds per ROI (defensive clamp: an out-of-patch corner would
    # make the kernel's dynamic lane slice read out of bounds)
    pyc = select([jnp.full_like(lh, py_k) for py_k, _ in classes])
    pxc = select([jnp.full_like(lw, px_k) for _, px_k in classes])

    img = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
    meta = jnp.stack(
        [
            img,
            li,
            cls,
            y0a // 8,
            x0a,
            jnp.zeros_like(li),
            jnp.zeros_like(li),
            jnp.zeros_like(li),
        ],
        axis=1,
    )  # [N, 8]

    # x-interp as ONE 2C-wide patch slice per pool column: the kernel reads
    # patch[x0w] and patch[x0w + 1] and blends with weight wx'. Exact cases:
    #   x1r == x0r + 1 (normal):        x0w = x0r,            wx' = wx
    #   x1r == x0r (edge clamp; the true sample is patch[x0r] — wx is 0
    #   there for every in-envelope row, see corners()):
    #     x0r <= px-2:                  x0w = x0r,            wx' = 0
    #     x0r == px-1 (keep the 2C read in patch bounds):
    #                                   x0w = px-2,           wx' = 1
    x0r = jnp.clip(x0i - x0a[:, None], 0, pxc[:, None] - 1)
    x1r = jnp.clip(x1i - x0a[:, None], 0, pxc[:, None] - 1)
    adj = x1r > x0r
    x0w = jnp.where(adj, x0r, jnp.minimum(x0r, pxc[:, None] - 2))
    xint_arr = x0w.astype(jnp.int32)  # [N, pool]
    wx_arr = jnp.where(
        adj, wx.astype(jnp.float32),
        (x0r > pxc[:, None] - 2).astype(jnp.float32),
    )  # [N, pool] adjusted weights
    geom_arr = jnp.stack(
        [
            jnp.clip(y0i - y0a[:, None], 0, pyc[:, None] - 1).astype(
                jnp.float32
            ),
            jnp.clip(y1i - y0a[:, None], 0, pyc[:, None] - 1).astype(
                jnp.float32
            ),
            wy.astype(jnp.float32),
            wx.astype(jnp.float32),
        ],
        axis=-1,
    )  # [N, pool, 4]

    return {
        "meta": meta,
        "xint": xint_arr,
        "wx": wx_arr,
        "geom": geom_arr,
        "zero_row": zero_row,
        "no_fit": no_fit,
        "li": li,
        "cls": cls,
        "classes": classes,
    }


def batched_multilevel_roi_align_pallas(
    features: Sequence[Array],
    boxes: Array,
    image_shape: Tuple[int, int],
    crop_size: Tuple[int, int],
    min_level: int = 2,
    interpret: bool = False,
    k_rois: int | None = None,
    step_rois: int | None = None,
    out_quant: Array | None = None,
    in_scale: Array | None = None,
    skip_chunks: bool = False,
) -> Array:
    """Drop-in Pallas replacement for `batched_multilevel_roi_align`.

    features: per-level [B, H_l, W_l, C]; boxes [B, R, 4] normalized AND
    clipped to [0, 1]; returns [B, R, ph, pw, C] with ph == pw == pool.
    `k_rois` overrides the ROIs-in-flight batching factor (default K_ROIS;
    higher amortizes per-step fixed costs at more VMEM scratch).
    `step_rois` (a multiple of k_rois; default k_rois) widens each GRID
    step to cover step_rois ROIs, processed as an in-kernel loop of
    k_rois-sized chunks over the same double-buffered patch store — the
    per-step pipelined input-block copies (~1.2-1.9 us/step of fixed cost,
    5 blocks) amortize across step_rois/k_rois chunks instead of one
    (config.align_step_rois).

    `out_quant`: optional [ph, pw, C] float32 map of the consumer's
    calibrated activation scales — when given the kernel quantizes pooled
    values in its epilogue and returns int8, bit-identical to
    ``quant.quantize_act(pooled, scale)`` of the unquantized output
    (per-position map; broadcast a scalar/per-channel scale before the
    call). Skips the separate multi-GB quantize pass XLA cannot fuse into
    the opaque pallas_call.

    `in_scale`: when given, `features` are int8 activations quantized with
    this scale (scalar or per-channel [C] — e.g. the P-levels the RPN's
    shared conv already quantized, config.int8_align_inputs). Patches DMA
    at 1 B/elt — HALF the bf16 bytes on the patch-DMA-bound box stage —
    and the kernel blends the raw codes (exact in bf16), deferring the
    linear s_in/127 dequant to the epilogue map: s_in/127 for float
    output, s_in/s_out folded with `out_quant` for int8 output. Numerics
    match aligning the dequantized features up to bf16 blend rounding
    (tolerance-tested, not bit-exact).

    `skip_chunks` (config.align_skip_chunks): gate each K-ROI chunk's DMA
    issue on a precomputed any-DMA-class flag (cached-top rows never issue
    patch DMAs, so all-top chunks skip the issue loop too) and its
    processing on an any-real flag, so all-sentinel chunks (contiguous
    zero-padding tails) cost one predicate instead of ~20*K.
    Bit-identical outputs — start_dmas is a no-op for top/sentinel rows,
    and sentinel rows are overwritten by the zero-row select either way.
    """
    features = list(features)
    b, _, _, c = features[0].shape
    r = boxes.shape[1]
    ph, pw = crop_size
    assert ph == pw, "square pool expected"
    pool = ph
    n = b * r
    num_levels = len(features)
    heights = np.array([f.shape[1] for f in features], dtype=np.int32)
    widths = np.array([f.shape[2] for f in features], dtype=np.int32)

    assert pallas_roi_align_supported(features), (
        "level dims too small for the static patch classes — use the XLA "
        "roi_align (images >= ~1024² supported here)"
    )
    rm = _route_and_meta(boxes, image_shape, heights, widths, pool, min_level, b, r)
    meta, xint_arr, wx_arr, geom_arr = rm["meta"], rm["xint"], rm["wx"], rm["geom"]
    zero_row, classes = rm["zero_row"], rm["classes"]

    # pad the ROI axis to a multiple of the grid-step width with benign
    # rows (sentinel class -1: no DMA, no compute) — outputs sliced off
    k_r = k_rois or K_ROIS
    step = step_rois or k_r
    assert step % k_r == 0, (step, k_r)
    m_chunks = step // k_r
    n_pad = ((n + step - 1) // step) * step
    pad = n_pad - n

    def pad0(a):
        widths_ = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths_) if pad else a

    meta = pad0(meta)
    if pad:  # pad rows take the sentinel skip class too (no DMA/compute)
        meta = meta.at[n:, 2].set(-1)
    xint_arr = pad0(xint_arr)[:, None, :]  # [N', 1, pool]
    wx_arr = pad0(wx_arr)[:, None, :]  # [N', 1, pool]
    geom_arr = pad0(geom_arr)

    # meta_cur block g covers rows [g*step, (g+1)*step); meta_next is the
    # table shifted by ONE CHUNK (K rows), so rows [mK, (m+1)K) of any
    # block are exactly chunk m+1's meta — uniformly across step
    # boundaries. The final prefetches target the pad rows — started but
    # benign (sentinel class matches no DMA branch; a real last row is a
    # valid copy)
    meta_next = jnp.concatenate(
        [meta[k_r:], jnp.tile(meta[-1:], (k_r, 1))], axis=0
    )
    # per-chunk flags (config.align_skip_chunks). Two distinct gates:
    #  - any_real (this chunk): any non-sentinel row — gates process_rows
    #    (all-sentinel zero-padding tails cost one predicate, not ~20*K);
    #  - any_dma (next chunk, shifted): any row in a patch-DMA class
    #    (0 <= cls < top_ci) — gates start_dmas. Cached-top rows never
    #    issue patch DMAs, so all-top chunks (the ENTIRE degenerate bench
    #    mix) skip the K*~10 issue predicates too, not just sentinel tails.
    # Chunk c of flags_next holds chunk c+1's any_dma flag (the prefetch
    # target); the wrapped last entry is never read (the c+1 < n guard
    # short-circuits). Bit-identical either way: start_dmas is a no-op for
    # top/sentinel rows (every issue predicate false).
    cls_chunks = meta[:, 2].reshape(n_pad // k_r, k_r)
    any_real = (
        (cls_chunks != -1).any(axis=1).astype(jnp.int32)[:, None, None]
    )  # [n_chunks, 1, 1] (Mosaic: last two block dims must equal array's)
    top_ci_host = len(classes) - 1
    any_dma = (
        ((cls_chunks >= 0) & (cls_chunks < top_ci_host))
        .any(axis=1)
        .astype(jnp.int32)[:, None, None]
    )
    flags_next = jnp.concatenate(
        [any_dma[1:], jnp.zeros((1, 1, 1), jnp.int32)], axis=0
    )
    meta_cur = meta[:, None, :]
    meta_next = meta_next[:, None, :]

    dt = features[0].dtype
    int8_in = in_scale is not None
    if int8_in:
        assert dt == jnp.int8, "in_scale given but features are not int8"
        s_in = jnp.asarray(in_scale, jnp.float32).reshape(-1)  # [1] or [C]
        s_in_c = jnp.broadcast_to(s_in, (c,)) if s_in.shape[0] != c else s_in
        tile_in = jnp.tile(s_in_c, pool).reshape(1, pool * c)
    compute_dt = jnp.bfloat16 if int8_in else dt
    quantize_out = out_quant is not None
    if quantize_out:
        s = out_quant.astype(jnp.float32).reshape(pool, pool * c)
        post = jnp.where(s > 0, 127.0 / jnp.maximum(s, 1e-30), 0.0)
        if int8_in:  # codes_out = round(codes_in-pooled * s_in/s_out)
            post = post * (tile_in / 127.0)
    elif int8_in:
        post = jnp.broadcast_to(tile_in / 127.0, (pool, pool * c))
    else:
        post = jnp.zeros((1, 1), jnp.float32)
    out_dt = jnp.int8 if quantize_out else compute_dt
    feat_views = [
        f.reshape(f.shape[0], f.shape[1], f.shape[2] * c) for f in features
    ]

    max_py = max(py for py, _ in classes[:-1])
    max_px = max(px for _, px in classes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_pad // step,),
        in_specs=[
            pl.BlockSpec(
                (step, 1, 8), lambda g: (g, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (step, 1, 8), lambda g: (g, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (m_chunks, 1, 1), lambda g: (g, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (m_chunks, 1, 1), lambda g: (g, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (step, 1, pool),
                lambda g: (g, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (step, 1, pool), lambda g: (g, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((step, pool, 4), lambda g: (g, 0, 0)),
            pl.BlockSpec(post.shape, lambda g: (0, 0)),
            *[pl.BlockSpec(memory_space=pl.ANY) for _ in range(4)],
        ],
        out_specs=pl.BlockSpec(
            (step, pool, pool * c), lambda g: (g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            # unified double-buffered patch store: [slot, j, PYmax, PXmax*C]
            pltpu.VMEM((2, k_r, max_py, max_px * c), dt),
            pltpu.VMEM(
                (classes[-1][0], classes[-1][1] * c), dt
            ),  # cached top level (single slot)
            pltpu.SMEM((1,), jnp.int32),  # image id cached in b_top
            # x-blended patch columns [py, pool*C] (largest py of any class)
            pltpu.VMEM((max(py for py, _ in classes), pool * c), compute_dt),
            pltpu.SemaphoreType.DMA((2, k_r)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    # scratch VMEM grows linearly in k_r (the double-buffered patch store is
    # 2*K*BIG bytes); raise the scoped-vmem cap above the 16MB default when
    # K needs it (the xla_tpu_scoped_vmem_limit_kib flag must allow it —
    # bench.py/cli set it; v5e has 128MB VMEM/core)
    itemsize = np.dtype(dt).itemsize
    citemsize = np.dtype(compute_dt).itemsize
    scratch_bytes = (
        2 * k_r * max_py * max_px * c * itemsize  # bufs
        + classes[-1][0] * classes[-1][1] * c * itemsize  # b_top
        + max_py * pool * c * citemsize  # xb (x-blended patch)
        # double-buffered pipelined blocks: out dominates; geom small
        + 2 * step * pool * (pool * c * np.dtype(out_dt).itemsize + 16)
    )
    vmem_limit = max(16 * 1024 * 1024, scratch_bytes + 8 * 1024 * 1024)
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            pool=pool,
            chans=c,
            classes=classes,
            level_dims=tuple(zip(heights.tolist(), widths.tolist())),
            compute_dtype=compute_dt,
            quantize_out=quantize_out,
            int8_in=int8_in,
            k_rois=k_r,
            m_chunks=m_chunks,
            skip_chunks=skip_chunks,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, pool, pool * c), out_dt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(
        meta_cur,
        meta_next,
        any_real,
        flags_next,
        xint_arr,
        wx_arr,
        geom_arr,
        post,
        *feat_views,
    )
    out = out[:n].reshape(b, r, pool, pool, c)
    # exact zero-box value: bilinear at (0, 0) of the finest level (the
    # roi_levels parity rule) == that level's corner feature, replicated
    p2_corner = features[0][:, 0, 0, :]  # [B, C] (raw codes when int8_in)
    if quantize_out:
        # quantize the replicated corner with the same per-position map the
        # kernel applies (the map already folds the s_in dequant when the
        # inputs are int8; bf16 round-trip included via the feature dtype)
        v = p2_corner.astype(jnp.float32)[:, None, None, :] * post.reshape(
            pool, pool, c
        )[None]
        fill = jnp.clip(jnp.round(v), -128.0, 127.0).astype(jnp.int8)
    elif int8_in:
        # dequantized corner via the same s_in/127 map the kernel applies
        fill = (
            p2_corner.astype(jnp.float32)[:, None, None, :]
            * post.reshape(pool, pool, c)[None]
        ).astype(out.dtype)
    else:
        fill = jnp.broadcast_to(
            p2_corner.astype(out.dtype)[:, None, None, :],
            (b, pool, pool, c),
        )
    return jnp.where(
        zero_row.reshape(b, r)[..., None, None, None],
        fill[:, None],
        out,
    )
