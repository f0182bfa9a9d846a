"""Pallas anchor-match kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetection_tpu.ops.anchor_match import (
    anchor_match_pallas,
    anchor_match_xla,
)


def random_boxes(rng, n, scale=1.0):
    c = rng.rand(n, 2) * 0.8 + 0.1
    s = rng.rand(n, 2) * 0.1 + 0.02
    return np.concatenate([c - s, c + s], axis=1).astype(np.float32) * scale


class TestPallasMatchesXLA:
    @pytest.mark.parametrize("seed,a,g,tile", [(0, 500, 12, 128), (1, 1024, 7, 256)])
    def test_agreement(self, seed, a, g, tile):
        rng = np.random.RandomState(seed)
        anchors = jnp.asarray(random_boxes(rng, a))
        gt = jnp.asarray(random_boxes(rng, g))
        valid = jnp.asarray(rng.rand(g) > 0.3)
        x = anchor_match_xla(anchors, gt, valid)
        p = anchor_match_pallas(anchors, gt, valid, tile_size=tile, interpret=True)
        np.testing.assert_allclose(
            np.asarray(p.anchor_max), np.asarray(x.anchor_max), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(p.gt_max), np.asarray(x.gt_max), rtol=1e-5
        )
        # argmaxes must point at equally-good matches
        iou_p = np.asarray(p.anchor_max)
        am_p = np.asarray(p.anchor_argmax)
        am_x = np.asarray(x.anchor_argmax)
        same = am_p == am_x
        assert same.mean() > 0.99 or np.allclose(iou_p[~same], 0)
        np.testing.assert_array_equal(
            np.asarray(p.gt_argmax), np.asarray(x.gt_argmax)
        )

    def test_all_invalid_gt(self):
        rng = np.random.RandomState(3)
        anchors = jnp.asarray(random_boxes(rng, 256))
        gt = jnp.asarray(random_boxes(rng, 4))
        p = anchor_match_pallas(
            anchors, gt, jnp.zeros(4, bool), tile_size=128, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(p.anchor_max), 0.0)

    def test_under_grad_and_vmap(self):
        rng = np.random.RandomState(4)
        anchors = jnp.asarray(random_boxes(rng, 256))
        gt = jnp.asarray(np.stack([random_boxes(rng, 4) for _ in range(2)]))
        valid = jnp.ones((2, 4), bool)

        def f(gt_batch):
            m = jax.vmap(
                lambda g, v: anchor_match_pallas(
                    anchors, g, v, tile_size=128, interpret=True
                ).anchor_max
            )(gt_batch, valid)
            return jnp.sum(m)

        g = jax.grad(f)(gt)
        assert np.asarray(g).shape == gt.shape  # zero tangents, but traceable
