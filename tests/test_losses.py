"""Loss-function tests with hand-computed golden values."""

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_tpu import losses


class TestSmoothL1:
    def test_piecewise(self):
        x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
        out = np.asarray(losses.smooth_l1(x))
        np.testing.assert_allclose(out, [1.5, 0.125, 0.0, 0.125, 1.5], rtol=1e-6)


class TestRPNClassLoss:
    def test_neutral_excluded(self):
        # anchor 0: positive, logits favor fg → small loss
        # anchor 1: neutral → excluded entirely
        # anchor 2: negative, logits favor fg → large loss
        target = jnp.asarray([[1, 0, -1]])
        good = 5.0
        logits = jnp.asarray([[[0.0, good], [100.0, -100.0], [0.0, good]]])
        loss = float(losses.rpn_class_loss(target, logits))
        # manual: CE(fg|fg-favored) and CE(bg|fg-favored), averaged over 2
        p_fg = np.exp(good) / (1 + np.exp(good))
        expected = (-np.log(p_fg) + -np.log(1 - p_fg)) / 2
        np.testing.assert_allclose(loss, expected, rtol=1e-5)

    def test_all_neutral_zero(self):
        target = jnp.zeros((1, 5), jnp.int32)
        logits = jnp.ones((1, 5, 2))
        assert float(losses.rpn_class_loss(target, logits)) == 0.0


class TestRPNBoxLoss:
    def test_perfect_prediction_zero(self):
        target_class = jnp.asarray([[0, 1, 0, 1, -1]])
        pred = jnp.asarray(
            np.arange(5 * 4, dtype=np.float32).reshape(1, 5, 4) / 10
        )
        # targets packed in positive-anchor order: anchors 1, 3
        tgt = jnp.zeros((1, 3, 4)).at[0, 0].set(pred[0, 1]).at[0, 1].set(pred[0, 3])
        loss = float(losses.rpn_box_loss(tgt, pred, target_class))
        assert loss < 1e-6

    def test_known_error(self):
        target_class = jnp.asarray([[1, 0]])
        pred = jnp.zeros((1, 2, 4))
        tgt = jnp.full((1, 1, 4), 0.5)
        loss = float(losses.rpn_box_loss(tgt, pred, target_class))
        np.testing.assert_allclose(loss, 0.5 * 0.25, rtol=1e-5)  # 0.5*x^2

    def test_no_positives_zero(self):
        target_class = jnp.asarray([[-1, 0]])
        assert (
            float(
                losses.rpn_box_loss(
                    jnp.zeros((1, 1, 4)), jnp.ones((1, 2, 4)), target_class
                )
            )
            == 0.0
        )


class TestMRCNNClassLoss:
    def test_correct_prediction_small(self):
        tgt = jnp.asarray([[2, 0]])
        logits = jnp.asarray([[[0, 0, 10, 0], [10, 0, 0, 0]]], jnp.float32)
        active = jnp.ones((1, 4), jnp.int32)
        loss = float(losses.mrcnn_class_loss(tgt, logits, active))
        assert loss < 1e-3

    def test_inactive_classes_masked(self):
        tgt = jnp.asarray([[1]])
        logits = jnp.asarray([[[0.0, 0, 10, 0]]])  # predicts class 2
        active = jnp.asarray([[1, 1, 0, 1]])  # class 2 inactive
        loss = float(losses.mrcnn_class_loss(tgt, logits, active))
        assert loss == 0.0  # the only row's prediction is inactive


class TestMRCNNBoxLoss:
    def test_selects_target_class_delta(self):
        b, t, c = 1, 3, 4
        tgt_ids = jnp.asarray([[2, 0, 0]])
        tgt_deltas = jnp.zeros((b, t, 4)).at[0, 0].set(jnp.asarray([1, 1, 1, 1.0]))
        pred = jnp.zeros((b, t, c, 4))
        # prediction for class 2 of roi 0 == target → zero loss
        pred = pred.at[0, 0, 2].set(jnp.asarray([1, 1, 1, 1.0]))
        loss = float(losses.mrcnn_box_loss(tgt_deltas, pred, tgt_ids))
        assert loss < 1e-6
        # wrong-class prediction ignored
        pred2 = pred.at[0, 0, 1].set(jnp.asarray([9, 9, 9, 9.0]))
        assert float(losses.mrcnn_box_loss(tgt_deltas, pred2, tgt_ids)) < 1e-6

    def test_compat_reference_binary_ce(self):
        tgt_ids = jnp.asarray([[1]])
        tgt = jnp.full((1, 1, 4), 0.5)
        pred = jnp.full((1, 1, 4, 4), 0.5)
        loss = float(
            losses.mrcnn_box_loss(tgt, pred, tgt_ids, compat_reference=True)
        )
        np.testing.assert_allclose(loss, -np.log(0.5), rtol=1e-4)


class TestMaskLoss:
    def test_perfect_mask_small(self):
        tgt_ids = jnp.asarray([[1, 0]])
        target = jnp.zeros((1, 2, 4, 4)).at[0, 0, :2].set(1.0)
        pred = jnp.full((1, 2, 4, 4, 3), 0.5)
        pred = pred.at[0, 0, :, :, 1].set(target[0, 0] * 0.998 + 0.001)
        loss = float(losses.mask_loss(target, pred, tgt_ids))
        assert loss < 0.01

    def test_no_positives_zero(self):
        tgt_ids = jnp.zeros((1, 2), jnp.int32)
        assert (
            float(
                losses.mask_loss(
                    jnp.zeros((1, 2, 4, 4)), jnp.full((1, 2, 4, 4, 3), 0.5), tgt_ids
                )
            )
            == 0.0
        )


class TestGradients:
    def test_all_losses_differentiable(self):
        rng = np.random.RandomState(0)

        def f(logits):
            return losses.rpn_class_loss(jnp.asarray([[1, -1, 0]]), logits)

        g = jax.grad(f)(jnp.asarray(rng.randn(1, 3, 2), jnp.float32))
        assert np.isfinite(np.asarray(g)).all()

        def f2(pred):
            return losses.rpn_box_loss(
                jnp.ones((1, 2, 4)), pred, jnp.asarray([[1, 1, -1]])
            )

        g2 = jax.grad(f2)(jnp.asarray(rng.randn(1, 3, 4), jnp.float32))
        assert np.isfinite(np.asarray(g2)).all()
