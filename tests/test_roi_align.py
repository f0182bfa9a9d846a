"""ROIAlign tests: agreement with a numpy crop_and_resize reference.

The numpy golden re-implements `tf.image.crop_and_resize` bilinear semantics
(corner-aligned sampling over (size-1)); the multilevel version must reproduce
the reference's level assignment (maskrcnn.py:104-122) and preserve ROI order.
"""

import numpy as np
import jax
import jax.numpy as jnp

from objectdetection_tpu.ops import roi_align


def np_crop_and_resize(image, boxes, crop_size):
    """tf.image.crop_and_resize (bilinear, extrapolation 0) for one image."""
    h, w, c = image.shape
    ph, pw = crop_size
    out = np.zeros((len(boxes), ph, pw, c), np.float32)
    for r, (y1, x1, y2, x2) in enumerate(boxes):
        for i in range(ph):
            y = (
                y1 * (h - 1) + i * (y2 - y1) * (h - 1) / (ph - 1)
                if ph > 1
                else 0.5 * (y1 + y2) * (h - 1)
            )
            for j in range(pw):
                x = (
                    x1 * (w - 1) + j * (x2 - x1) * (w - 1) / (pw - 1)
                    if pw > 1
                    else 0.5 * (x1 + x2) * (w - 1)
                )
                if y < 0 or y > h - 1 or x < 0 or x > w - 1:
                    continue
                y0, x0 = int(np.floor(y)), int(np.floor(x))
                y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                wy, wx = y - y0, x - x0
                top = image[y0, x0] * (1 - wx) + image[y0, x1i] * wx
                bot = image[y1i, x0] * (1 - wx) + image[y1i, x1i] * wx
                out[r, i, j] = top * (1 - wy) + bot * wy
    return out


class TestSingleLevel:
    def test_matches_numpy_reference(self):
        rng = np.random.RandomState(0)
        image = rng.rand(16, 16, 3).astype(np.float32)
        boxes = np.array(
            [
                [0.0, 0.0, 1.0, 1.0],
                [0.1, 0.2, 0.6, 0.9],
                [0.5, 0.5, 0.5, 0.5],  # degenerate point box
            ],
            np.float32,
        )
        got = np.asarray(
            roi_align.crop_and_resize(jnp.asarray(image), jnp.asarray(boxes), (7, 7))
        )
        want = np_crop_and_resize(image, boxes, (7, 7))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_identity_crop_is_resize_identity(self):
        rng = np.random.RandomState(1)
        image = rng.rand(7, 7, 2).astype(np.float32)
        got = np.asarray(
            roi_align.crop_and_resize(
                jnp.asarray(image), jnp.asarray([[0.0, 0, 1, 1]]), (7, 7)
            )
        )
        np.testing.assert_allclose(got[0], image, rtol=1e-5)


class TestLevels:
    def test_reference_level_rule(self):
        # maskrcnn.py:118-121 — a 224x224-pixel ROI in a 1024² image maps to P4
        area = 1024.0 * 1024.0
        side = 224.0 / 1023.0
        boxes = jnp.asarray(
            [
                [0, 0, side, side],  # ~224² → level 4
                [0, 0, side / 2, side / 2],  # ~112² → level 3
                [0, 0, 1.0, 1.0],  # whole image → clamped 5
                [0, 0, 0.01, 0.01],  # tiny → clamped 2
            ]
        )
        lv = np.asarray(roi_align.roi_levels(boxes, area))
        np.testing.assert_array_equal(lv, [4, 3, 5, 2])

    def test_degenerate_box_pinned_to_min(self):
        # zero-area boxes take the FINEST level: the reference's
        # log2(sqrt(0)) = -inf lands on max(min_k, ...) = 2
        # (maskrcnn.py:119-121; pinned by the end-to-end golden)
        lv = np.asarray(
            roi_align.roi_levels(jnp.zeros((3, 4)), 1024.0 * 1024.0)
        )
        np.testing.assert_array_equal(lv, [2, 2, 2])


class TestMultilevel:
    def _pyramid(self, rng, c=4):
        return [
            jnp.asarray(rng.rand(32, 32, c).astype(np.float32)),
            jnp.asarray(rng.rand(16, 16, c).astype(np.float32)),
            jnp.asarray(rng.rand(8, 8, c).astype(np.float32)),
            jnp.asarray(rng.rand(4, 4, c).astype(np.float32)),
        ]

    def test_matches_per_level_crops(self):
        rng = np.random.RandomState(2)
        feats = self._pyramid(rng)
        image_shape = (128, 128)
        boxes = np.array(
            [
                [0.1, 0.1, 0.3, 0.3],
                [0.0, 0.0, 0.9, 0.9],
                [0.4, 0.4, 0.45, 0.45],
            ],
            np.float32,
        )
        got = np.asarray(
            roi_align.multilevel_roi_align(
                feats, jnp.asarray(boxes), image_shape, (7, 7)
            )
        )
        lv = np.asarray(
            roi_align.roi_levels(jnp.asarray(boxes), float(128 * 128))
        )
        for r in range(len(boxes)):
            feat = np.asarray(feats[lv[r] - 2])
            want = np_crop_and_resize(feat, boxes[r : r + 1], (7, 7))[0]
            np.testing.assert_allclose(got[r], want, rtol=1e-4, atol=1e-5)

    def test_order_preserved_and_batched(self):
        rng = np.random.RandomState(3)
        feats = [jnp.stack([f, f * 2]) for f in self._pyramid(rng)]
        one = rng.rand(5, 4).astype(np.float32) * 0.35
        one[:, 2:] += 0.4
        boxes = jnp.asarray(np.stack([one, one]))
        out = roi_align.batched_multilevel_roi_align(
            feats, boxes, (128, 128), (7, 7)
        )
        assert out.shape == (2, 5, 7, 7, 4)
        np.testing.assert_allclose(
            np.asarray(out[1]), 2 * np.asarray(out[0]), rtol=1e-4
        )

    def test_jittable(self):
        rng = np.random.RandomState(4)
        feats = self._pyramid(rng)
        boxes = jnp.asarray(rng.rand(6, 4).astype(np.float32))
        fn = jax.jit(
            lambda f, b: roi_align.multilevel_roi_align(f, b, (128, 128), (7, 7))
        )
        assert fn(feats, boxes).shape == (6, 7, 7, 4)
