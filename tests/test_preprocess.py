"""Image molding tests: on-device vs host path parity, unmold roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_tpu.config import DetectorConfig
from objectdetection_tpu.data.preprocess import (
    ImageMeta,
    compute_resize_params,
    mold_image_device,
    mold_image_host,
    unmold_detections,
)

CFG = DetectorConfig(
    image_shape=(128, 128, 3), image_min_dim=100, image_max_dim=128,
    num_classes=4,
)


class TestResizeParams:
    def test_square_upscale(self):
        # 64x80 → scale = 100/64 = 1.5625, capped by 128/80 = 1.6 → 1.5625
        scale, nh, nw, top, left = [
            float(v) for v in compute_resize_params(64, 80, 100, 128)
        ]
        assert abs(scale - 1.5625) < 1e-6
        assert nh == 100 and nw == 125
        assert top == 14.0 and left == 1.0

    def test_cap_at_max_dim(self):
        # 50x200: scale = 100/50 = 2 capped by 128/200 = 0.64
        scale, nh, nw, *_ = [
            float(v) for v in compute_resize_params(50, 200, 100, 128)
        ]
        assert abs(scale - 0.64) < 1e-6
        assert nw == 128

    def test_min_scale_golden_vs_reference_port(self):
        """Nonzero min_scale vs a direct numpy port of utils.py:78-120
        (reference signature parity: scale = max(scale, min_scale) BEFORE
        the max_dim cap, so min_scale can still be overridden by the cap)."""

        def reference_port(h, w, min_dim, max_dim, min_scale):
            scale = max(1, min_dim / min(h, w))
            scale = max(scale, min_scale) if min_scale else scale
            scale = min(scale, max_dim / max(h, w))
            nh, nw = round(h * scale), round(w * scale)
            return scale, nh, nw, (max_dim - nh) // 2, (max_dim - nw) // 2

        cases = [
            # min_scale raises the scale above the min_dim rule
            (64, 80, 100, 256, 2.5),
            # min_scale set but beaten by the max_dim cap
            (50, 200, 100, 128, 3.0),
            # min_scale below the natural scale: no effect
            (64, 80, 100, 128, 1.1),
            # square input
            (100, 100, 100, 200, 1.7),
        ]
        for h, w, min_dim, max_dim, ms in cases:
            want = reference_port(h, w, min_dim, max_dim, ms)
            got = [
                float(v)
                for v in compute_resize_params(h, w, min_dim, max_dim, ms)
            ]
            assert abs(got[0] - want[0]) < 1e-6, (h, w, ms)
            assert got[1:] == [float(v) for v in want[1:]], (h, w, ms, got, want)


class TestMoldParity:
    def test_device_matches_host(self):
        # smooth image: resize-kernel phase differences (cv2 vs
        # scale_and_translate) vanish; random noise would amplify them
        h0, w0 = 64, 96
        yy, xx = np.mgrid[0:h0, 0:w0].astype(np.float32)
        img = np.stack(
            [yy * 2, xx * 1.5, 100 + 50 * np.sin(yy / 9) * np.cos(xx / 11)],
            axis=-1,
        )

        host_molded, host_window, host_scale = mold_image_host(img, CFG)

        canvas = np.zeros((128, 128, 3), np.float32)
        canvas[:h0, :w0] = img
        dev_molded, dev_window, dev_scale = jax.jit(
            lambda c, s: mold_image_device(c, s, CFG)
        )(jnp.asarray(canvas), jnp.asarray([h0, w0]))

        assert abs(float(dev_scale) - host_scale) < 1e-5
        np.testing.assert_allclose(
            np.asarray(dev_window), host_window, atol=1.0
        )
        # interiors agree loosely (cv2 INTER_LINEAR vs scale_and_translate)
        y1, x1, y2, x2 = host_window
        a = np.asarray(dev_molded)[y1 + 2 : y2 - 2, x1 + 2 : x2 - 2]
        b = host_molded[y1 + 2 : y2 - 2, x1 + 2 : x2 - 2]
        assert np.abs(a - b).mean() < 6.0  # pixel-value units
        # padding region identical (mean-subtracted zeros)
        np.testing.assert_allclose(
            np.asarray(dev_molded)[:, : x1 - 1],
            host_molded[:, : x1 - 1],
            atol=2.0,
        )

    def test_no_resize_case(self):
        rng = np.random.RandomState(1)
        img = (rng.rand(128, 128, 3) * 255).astype(np.float32)
        molded, window, scale = mold_image_host(img, CFG)
        assert scale == 1.0
        np.testing.assert_array_equal(window, [0, 0, 128, 128])
        np.testing.assert_allclose(
            molded, img - np.array(CFG.mean_pixel, np.float32), atol=1e-4
        )


class TestUnmold:
    def test_roundtrip_box(self):
        # a box occupying the middle of the window maps back to original px
        window = jnp.asarray([14.0, 1.0, 114.0, 126.0])  # 100x125 content
        det = jnp.zeros((3, 6))
        # normalized (molded-frame) box covering window rows 34..74
        y1 = (34 - 0) / 127.0
        y2 = (74 - 1) / 127.0
        x1 = (26 - 0) / 127.0
        x2 = (76 - 1) / 127.0
        det = det.at[0].set(jnp.asarray([y1, x1, y2, x2, 2.0, 0.9]))
        boxes, cls, scores, valid = unmold_detections(
            det, window, (128, 128), jnp.asarray([64, 80])
        )
        assert bool(valid[0]) and not bool(valid[1])
        assert int(cls[0]) == 2
        b = np.asarray(boxes[0])
        # window-relative fraction * original size: rows (34-14)/100≈0.2 → y≈0.2*63
        assert 10 <= b[0] <= 16
        assert 30 <= b[2] <= 40
        assert np.all(b >= 0) and b[3] <= 80

    def test_zero_rows_invalid(self):
        det = jnp.zeros((5, 6))
        _, _, _, valid = unmold_detections(
            det, jnp.asarray([0.0, 0, 128, 128]), (128, 128), jnp.asarray([128, 128])
        )
        assert not np.asarray(valid).any()


class TestBatchedMold:
    def test_mold_batch_device_matches_single(self):
        rng = np.random.RandomState(2)
        canvases = np.zeros((2, 128, 128, 3), np.float32)
        shapes = np.array([[64, 96], [100, 80]], np.int32)
        for i, (h0, w0) in enumerate(shapes):
            canvases[i, :h0, :w0] = rng.rand(h0, w0, 3) * 255

        from objectdetection_tpu.data.preprocess import mold_batch_device

        molded, meta = jax.jit(
            lambda c, s: mold_batch_device(c, s, CFG)
        )(jnp.asarray(canvases), jnp.asarray(shapes))
        assert molded.shape == (2, 128, 128, 3)
        assert meta.window.shape == (2, 4)
        for i in range(2):
            m1, w1, s1 = mold_image_device(
                jnp.asarray(canvases[i]), jnp.asarray(shapes[i]), CFG
            )
            np.testing.assert_allclose(
                np.asarray(molded[i]), np.asarray(m1), atol=1e-2
            )
            np.testing.assert_allclose(
                np.asarray(meta.window[i]), np.asarray(w1), atol=1e-4
            )
        vec = np.asarray(meta.to_vector())
        assert vec.shape == (2, 12 + CFG.num_classes)


class TestUnmoldNp:
    def test_matches_device_unmold(self):
        from objectdetection_tpu.data.preprocess import unmold_detections_np

        rng = np.random.RandomState(3)
        det = np.zeros((6, 6), np.float32)
        det[:4, :4] = np.sort(rng.rand(4, 2, 2), axis=1).transpose(0, 2, 1).reshape(4, 4)
        det[:4, 4] = [1, 2, 3, 1]
        det[:4, 5] = rng.rand(4) * 0.5 + 0.5
        window = np.array([14.0, 1.0, 114.0, 126.0], np.float32)
        b1, c1, s1, v1 = unmold_detections(
            jnp.asarray(det), jnp.asarray(window), (128, 128), jnp.asarray([64, 80])
        )
        b2, c2, s2, v2 = unmold_detections_np(det, window, (128, 128), [64, 80])
        np.testing.assert_array_equal(np.asarray(b1), b2)
        np.testing.assert_array_equal(np.asarray(v1), v2)


class TestImageMeta:
    def test_vector_layout(self):
        meta = ImageMeta(
            image_id=jnp.asarray([3]),
            original_shape=jnp.asarray([[64, 80, 3]]),
            image_shape=jnp.asarray([[128, 128, 3]]),
            window=jnp.asarray([[14.0, 1, 114, 126]]),
            scale=jnp.asarray([1.5625]),
            active_class_ids=jnp.ones((1, 4), jnp.int32),
        )
        v = np.asarray(meta.to_vector())
        assert v.shape == (1, 12 + 4)
        assert v[0, 0] == 3
        np.testing.assert_allclose(v[0, 1:4], [64, 80, 3])
        np.testing.assert_allclose(v[0, 11], 1.5625)
