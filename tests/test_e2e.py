"""End-to-end tests: jitted inference + training on the shapes config.

These exercise the single-program pipelines the reference split into
stage-wise sess.run + pickle handoffs (SURVEY.md §3). Sizes are shrunk for
CPU CI; shapes/structure match the real configs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetection_tpu.config import SHAPES_CONFIG
from objectdetection_tpu import detector
from objectdetection_tpu.data.shapes import ShapesDataset

CFG = SHAPES_CONFIG.replace(
    pre_nms_rois_count=512,
    post_nms_rois_training=128,
    post_nms_rois_inference=64,
    train_rois_per_image=16,
    rpn_train_anchors_per_image=64,
)


@pytest.fixture(scope="module")
def variables():
    return detector.init_variables(CFG, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def dataset():
    return ShapesDataset(8, 128, 128, seed=11)


class TestInference:
    def test_full_pipeline_contract(self, variables, dataset):
        batch = dataset.load_batch([0, 1], CFG, with_masks=False)
        windows = jnp.tile(jnp.asarray([[0.0, 0.0, 128.0, 128.0]]), (2, 1))
        infer = detector.make_infer_fn(CFG, with_masks=True)
        det = infer(variables, jnp.asarray(batch.images), windows)
        n = CFG.detection_post_nms_instances
        assert det.boxes.shape == (2, n, 4)
        assert det.class_ids.shape == (2, n)
        assert det.masks.shape == (2, n, 28, 28)
        b = np.asarray(det.boxes)
        assert np.isfinite(b).all()
        assert (b >= 0).all() and (b <= 1).all()
        # empty slots are fully zeroed
        invalid = ~np.asarray(det.valid)
        assert (b[invalid] == 0).all()

    def test_no_masks_path(self, variables, dataset):
        batch = dataset.load_batch([0], CFG, with_masks=False)
        windows = jnp.asarray([[0.0, 0.0, 128.0, 128.0]])
        det = detector.make_infer_fn(CFG, with_masks=False)(
            variables, jnp.asarray(batch.images), windows
        )
        assert det.masks is None


@pytest.mark.slow  # compile/interpret-heavy: run via `pytest -m ""` or CI
class TestTraining:
    def test_losses_finite_and_decrease(self, dataset):
        state = detector.create_train_state(CFG, jax.random.PRNGKey(0))
        step = detector.make_train_step(CFG, with_masks=True)
        batch = jax.tree.map(
            jnp.asarray, dataset.load_batch([0, 1], CFG, with_masks=True)
        )
        metrics0 = None
        for i in range(4):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            assert np.isfinite(float(metrics["total_loss"])), metrics
            if metrics0 is None:
                metrics0 = metrics
        # same batch repeated: total loss must drop
        assert float(metrics["total_loss"]) < float(metrics0["total_loss"])
        assert int(state.step) == 4

    def test_gradients_reach_all_heads(self, dataset):
        state = detector.create_train_state(CFG, jax.random.PRNGKey(0))
        batch = jax.tree.map(
            jnp.asarray, dataset.load_batch([2, 3], CFG, with_masks=True)
        )

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            parts = detector.compute_losses(
                variables, batch, CFG, jax.random.PRNGKey(5), with_masks=True
            )
            return sum(parts.values())

        grads = jax.grad(loss_fn)(state.params)
        gnorm = lambda tree: float(
            sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(tree))
        )
        assert gnorm(grads["fpn"]) > 0
        assert gnorm(grads["rpn_model"]) > 0
        assert gnorm(grads["mrcnn"]) > 0


class TestShapesData:
    def test_deterministic(self):
        a = ShapesDataset(3, 128, 128, seed=5)
        b = ShapesDataset(3, 128, 128, seed=5)
        np.testing.assert_array_equal(a.image(0), b.image(0))

    def test_masks_match_boxes(self, dataset):
        masks, class_ids = dataset.masks(0)
        boxes = dataset.bboxes_from_masks(masks)
        assert masks.shape[:2] == (128, 128)
        assert len(class_ids) == masks.shape[-1] == len(boxes)
        assert set(class_ids) <= {1, 2, 3}
        for i in range(len(boxes)):
            y1, x1, y2, x2 = boxes[i]
            if (y2 - y1) * (x2 - x1) > 0:
                assert masks[y1:y2, x1:x2, i].any()
                # nothing outside the box
                outside = masks[:, :, i].copy()
                outside[y1:y2, x1:x2] = False
                assert not outside.any()

    def test_occlusion_masks_disjoint(self, dataset):
        for i in range(4):
            masks, _ = dataset.masks(i)
            overlap = masks.astype(np.int32).sum(-1)
            assert overlap.max() <= 1
