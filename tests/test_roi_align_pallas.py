"""Parity of the Pallas patch-DMA ROIAlign vs the XLA gather formulation.

Runs the kernel in interpret mode on CPU over COCO-sized pyramids (the
kernel's static patch classes require >= ~1024² level dims) and checks
bitwise-close agreement with `batched_multilevel_roi_align` across the ROI
taxonomy: tiny (P2), bucket-edge, large (P5-clamped), full-image,
boundary-hugging, and zero-padding boxes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetection_tpu.ops.roi_align import batched_multilevel_roi_align
from objectdetection_tpu.ops.roi_align_pallas import (
    batched_multilevel_roi_align_pallas,
    pallas_roi_align_supported,
)

C = 128
IMAGE = (1024, 1024)


@pytest.fixture(scope="module")
def pyramid():
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(2, s, s, C).astype(np.float32))
        for s in (256, 128, 64, 32)
    ]
    return feats


def _boxes():
    rng = np.random.RandomState(1)
    boxes = []
    # random boxes across the size spectrum
    for _ in range(40):
        size = np.exp(rng.uniform(np.log(0.01), np.log(0.9)))
        y = rng.uniform(0, 1 - size)
        x = rng.uniform(0, 1 - size)
        ar = np.exp(rng.uniform(np.log(0.5), np.log(2.0)))
        h, w = min(size * ar, 1 - y), min(size / ar, 1 - x)
        boxes.append([y, x, y + h, x + w])
    boxes += [
        [0.0, 0.0, 1.0, 1.0],  # full image (P5-clamped, class 2)
        [0.0, 0.0, 0.004, 0.004],  # tiny at the corner (P2)
        [0.99, 0.99, 1.0, 1.0],  # boundary-hugging
        [0.3, 0.3, 0.3, 0.3],  # degenerate (zero area)
        [0.0, 0.0, 0.0, 0.0],  # zero padding
        [0.1, 0.2, 0.52, 0.62],  # bucket-edge large span
        [0.55, 0.0, 0.55, 1.0],  # window-edge flat sliver (no_fit reroute)
    ]
    while len(boxes) % 8:
        boxes.append([0.0, 0.0, 0.0, 0.0])
    b1 = np.asarray(boxes, np.float32)
    b2 = b1[::-1].copy()
    return jnp.asarray(np.stack([b1, b2]))


@pytest.mark.slow  # compile/interpret-heavy: run via `pytest -m ""` or CI
class TestPallasRoiAlign:
    def test_supported_gate(self, pyramid):
        assert pallas_roi_align_supported(pyramid)
        small = [jnp.zeros((1, s, s, C)) for s in (32, 16, 8, 4)]
        assert not pallas_roi_align_supported(small)

    @pytest.mark.parametrize("pool", [7, 14])
    def test_matches_xla(self, pyramid, pool):
        from objectdetection_tpu.ops import roi_align_pallas as rap

        boxes = _boxes()
        b, r = boxes.shape[:2]
        ref = np.asarray(
            batched_multilevel_roi_align(pyramid, boxes, IMAGE, (pool, pool))
        )
        # reroute-aware expectation: no_fit rows (the window-edge sliver)
        # deliberately sample the full top level EXACTLY instead of corner-
        # clamping at their parity level (_route_and_meta docstring); every
        # other row must match the XLA multilevel path.
        heights = np.array([f.shape[1] for f in pyramid], np.int32)
        widths = np.array([f.shape[2] for f in pyramid], np.int32)
        rm = rap._route_and_meta(
            boxes, IMAGE, heights, widths, pool, 2, b, r
        )
        no_fit = np.asarray(rm["no_fit"]).reshape(b, r)
        assert no_fit.sum() == 2  # one sliver per image
        ref_top = np.asarray(
            batched_multilevel_roi_align(
                pyramid[-1:], boxes, IMAGE, (pool, pool)
            )
        )
        ref = np.where(no_fit[..., None, None, None], ref_top, ref)
        got = batched_multilevel_roi_align_pallas(
            pyramid, boxes, IMAGE, (pool, pool), interpret=True
        )
        assert got.shape == ref.shape == (2, boxes.shape[1], pool, pool, C)
        np.testing.assert_allclose(
            np.asarray(got), ref, rtol=1e-4, atol=1e-4
        )

    @pytest.mark.parametrize("step", [32, 64])
    def test_step_rois_matches_single_chunk(self, pyramid, step):
        # Multi-chunk grid steps (config.align_step_rois) run the SAME
        # per-chunk math over the same double-buffered patch store — the
        # output must be bit-identical to the default one-chunk-per-step
        # form, including when the step width forces extra pad rows
        # (n=96, step=64 -> n_pad=128).
        boxes = _boxes()
        base = batched_multilevel_roi_align_pallas(
            pyramid, boxes, IMAGE, (7, 7), interpret=True
        )
        got = batched_multilevel_roi_align_pallas(
            pyramid, boxes, IMAGE, (7, 7), interpret=True, step_rois=step
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base))

    @pytest.mark.parametrize("step", [None, 32])
    def test_skip_chunks_bit_identical(self, pyramid, step):
        # config.align_skip_chunks gates all-sentinel K-ROI chunks behind a
        # per-chunk any-real flag (their rows do no DMA/compute either way,
        # and their outputs are overwritten by the zero-row select) and the
        # DMA-issue loop behind an any-DMA-class flag. Must be bit-identical
        # to the ungated kernel, including with a long zero-padding tail
        # (whole chunks sentinel — the process skip actually fires), a full
        # chunk of consecutive cached-top rows (no patch-DMA class — the
        # issue skip actually fires), and with multi-chunk grid steps (flag
        # reads at dynamic m).
        bx = np.asarray(_boxes())
        top_chunk = np.tile(
            np.asarray([[0.0, 0.0, 1.0, 1.0]], np.float32), (16, 1)
        )
        boxes = jnp.asarray(
            np.concatenate(
                [
                    np.broadcast_to(top_chunk, (2, 16, 4)),
                    bx,
                    np.zeros((2, 32, 4), np.float32),
                ],
                axis=1,
            )
        )
        base = batched_multilevel_roi_align_pallas(
            pyramid, boxes, IMAGE, (7, 7), interpret=True, step_rois=step
        )
        got = batched_multilevel_roi_align_pallas(
            pyramid, boxes, IMAGE, (7, 7), interpret=True, step_rois=step,
            skip_chunks=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base))

    def test_int8_out_matches_quantize_act(self, pyramid):
        # out_quant makes the kernel emit int8 directly (cfg.int8_pooled);
        # codes must equal quantizing the kernel's own float output with
        # the same per-position scale map — bit-for-bit.
        boxes = _boxes()[:, :16]
        feats16 = [f.astype(jnp.bfloat16) for f in pyramid]
        pool = 7
        rng = np.random.RandomState(3)
        scale_map = jnp.asarray(
            rng.rand(pool, pool, C).astype(np.float32) * 5.0 + 0.1
        )
        ref = batched_multilevel_roi_align_pallas(
            feats16, boxes, IMAGE, (pool, pool), interpret=True
        )
        inv = 127.0 / scale_map
        want = jnp.clip(
            jnp.round(ref.astype(jnp.float32) * inv[None, None]),
            -128.0, 127.0,
        ).astype(jnp.int8)
        got = batched_multilevel_roi_align_pallas(
            feats16, boxes, IMAGE, (pool, pool), interpret=True,
            out_quant=scale_map,
        )
        assert got.dtype == jnp.int8
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_matches_xla_bf16(self, pyramid):
        from objectdetection_tpu.ops import roi_align_pallas as rap

        boxes = _boxes()[:, :16]
        b, r = boxes.shape[:2]
        feats16 = [f.astype(jnp.bfloat16) for f in pyramid]
        ref = np.asarray(
            batched_multilevel_roi_align(feats16, boxes, IMAGE, (7, 7)),
            np.float32,
        )
        # reroute-aware expectation (same as test_matches_xla): image 2 is
        # the reversed box list, so its first 16 rows include the window-edge
        # no_fit sliver, which samples the full top level by design.
        heights = np.array([f.shape[1] for f in pyramid], np.int32)
        widths = np.array([f.shape[2] for f in pyramid], np.int32)
        rm = rap._route_and_meta(boxes, IMAGE, heights, widths, 7, 2, b, r)
        no_fit = np.asarray(rm["no_fit"]).reshape(b, r)
        assert no_fit.sum() == 1  # the sliver, present only in image 2's slice
        ref_top = np.asarray(
            batched_multilevel_roi_align(feats16[-1:], boxes, IMAGE, (7, 7)),
            np.float32,
        )
        ref = np.where(no_fit[..., None, None, None], ref_top, ref)
        got = batched_multilevel_roi_align_pallas(
            feats16, boxes, IMAGE, (7, 7), interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(ref, np.float32),
            rtol=2e-2,
            atol=2e-2,
        )

    @pytest.mark.parametrize("per_channel", [False, True])
    def test_int8_inputs_match_dequantized_align(self, pyramid, per_channel):
        # cfg.int8_align_inputs: int8 features + in_scale must reproduce
        # aligning the DEQUANTIZED features (the bf16 path the XLA fallback
        # takes) up to bf16 blend rounding. Covers scalar and per-channel
        # input scales; uses the first 16 boxes (includes zero rows).
        from objectdetection_tpu.quant import dequantize_act, quantize_act

        boxes = _boxes()[:, :16]
        rng = np.random.RandomState(5)
        if per_channel:
            scale = jnp.asarray(rng.rand(C).astype(np.float32) * 3.0 + 0.5)
        else:
            scale = jnp.float32(2.7)
        feats8 = [quantize_act(f, scale) for f in pyramid]
        deq16 = [
            dequantize_act(f8, scale, jnp.bfloat16) for f8 in feats8
        ]
        ref = batched_multilevel_roi_align_pallas(
            deq16, boxes, IMAGE, (7, 7), interpret=True
        )
        got = batched_multilevel_roi_align_pallas(
            feats8, boxes, IMAGE, (7, 7), interpret=True, in_scale=scale
        )
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(ref, np.float32),
            rtol=2e-2,
            atol=2e-2 * float(jnp.max(scale)),
        )

    def test_int8_inputs_int8_out_codes(self, pyramid):
        # int8 in AND int8 out: codes must equal round(codes_pooled *
        # s_in/s_out) of the kernel's own raw-code pooling — i.e. quantizing
        # the kernel's float output (int8-in path) with the out map, within
        # one code of the fold (the fused map multiplies once where the
        # two-step path rounds twice).
        from objectdetection_tpu.quant import quantize_act

        boxes = _boxes()[:, :16]
        pool = 7
        scale_in = jnp.float32(2.7)
        feats8 = [quantize_act(f, scale_in) for f in pyramid]
        rng = np.random.RandomState(7)
        scale_map = jnp.asarray(
            rng.rand(pool, pool, C).astype(np.float32) * 5.0 + 0.1
        )
        ref_f = batched_multilevel_roi_align_pallas(
            feats8, boxes, IMAGE, (pool, pool), interpret=True,
            in_scale=scale_in,
        )
        want = jnp.clip(
            jnp.round(ref_f.astype(jnp.float32) * (127.0 / scale_map)),
            -128.0, 127.0,
        ).astype(jnp.int32)
        got = batched_multilevel_roi_align_pallas(
            feats8, boxes, IMAGE, (pool, pool), interpret=True,
            in_scale=scale_in, out_quant=scale_map,
        )
        assert got.dtype == jnp.int8
        diff = np.abs(np.asarray(got, np.int32) - np.asarray(want))
        assert diff.max() <= 1


class TestNoFitReroute:
    """Pins the no_fit coarse-level reroute (ADVICE r2): pathological
    finest-level ROIs — near-zero area but a span exceeding every patch
    class — are sampled from the cached top pyramid level instead of being
    corner-clamped. Asserts WHICH synthetic rows get no_fit=True (routing is
    pure shape math via _route_and_meta, no kernel run) and that their
    kernel output equals exact top-level sampling."""

    # [row, no_fit?] taxonomy at 1024²: finest level is 256² where the
    # largest non-top patch class is BIG=(48, 44)
    BOXES = np.asarray(
        [
            [0.2, 0.1, 0.2, 0.9],     # flat-in-y, 204-col span: no class fits
            [0.05, 0.3, 0.95, 0.3],   # flat-in-x, 229-row span: no class fits
            [0.1, 0.1, 0.14, 0.14],   # small P2 box: fits SMALL
            [0.2, 0.1, 0.2, 0.2],     # flat-in-y, 25-col span: fits FLATY
            [0.0, 0.0, 0.0, 0.0],     # zero padding: top-level shortcut
            [0.0, 0.0, 1.0, 1.0],     # full image: lives at the top level
            [0.3, 0.3, 0.3, 0.3],     # degenerate point: fits SMALL
            [0.48, 0.0, 0.52, 0.98],  # thin full-width band: no class fits
        ],
        np.float32,
    )
    EXPECT_NO_FIT = np.asarray([1, 1, 0, 0, 0, 0, 0, 1], bool)

    def test_reroute_set_pinned(self):
        from objectdetection_tpu.ops.roi_align_pallas import _route_and_meta

        heights = np.asarray([256, 128, 64, 32], np.int32)
        widths = heights.copy()
        rm = _route_and_meta(
            jnp.asarray(self.BOXES)[None], IMAGE, heights, widths,
            pool=7, min_level=2, b=1, r=len(self.BOXES),
        )
        np.testing.assert_array_equal(
            np.asarray(rm["no_fit"]), self.EXPECT_NO_FIT
        )
        # every rerouted row now reads the top level
        li = np.asarray(rm["li"])
        assert (li[self.EXPECT_NO_FIT] == len(heights) - 1).all()

    @pytest.mark.slow
    def test_rerouted_rows_equal_exact_top_level_sampling(self):
        rng = np.random.RandomState(3)
        feats = [
            jnp.asarray(rng.randn(1, s, s, C).astype(np.float32))
            for s in (256, 128, 64, 32)
        ]
        boxes = jnp.asarray(self.BOXES)[None]
        got = batched_multilevel_roi_align_pallas(
            feats, boxes, IMAGE, (7, 7), interpret=True
        )
        # exact sampling of the top level: a one-level pyramid forces every
        # ROI onto that level in the XLA reference implementation
        top_only = batched_multilevel_roi_align(
            [feats[-1]], boxes, IMAGE, (7, 7)
        )
        for i in np.where(self.EXPECT_NO_FIT)[0]:
            np.testing.assert_allclose(
                np.asarray(got)[0, i], np.asarray(top_only)[0, i],
                rtol=1e-5, atol=1e-5,
            )
