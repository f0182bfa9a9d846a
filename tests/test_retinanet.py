"""RetinaNet (framework extension) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from objectdetection_tpu.config import SHAPES_CONFIG
from objectdetection_tpu.detector import TrainBatch
from objectdetection_tpu.models import retinanet as rn

CFG = SHAPES_CONFIG.replace(
    image_shape=(64, 64, 3), image_min_dim=64, image_max_dim=64,
    rpn_anchor_scales=(8, 16, 32, 64, 128), max_gt_objects=4,
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = rn.RetinaNet(config=CFG)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return model, variables


class TestModel:
    def test_output_shapes_match_anchor_table(self, model_and_vars):
        model, variables = model_and_vars
        from objectdetection_tpu.anchors import config_anchors

        a = config_anchors(CFG).shape[0]
        logits, deltas = model.apply(variables, jnp.zeros((2, 64, 64, 3)))
        assert logits.shape == (2, a, CFG.num_classes - 1)
        assert deltas.shape == (2, a, 4)

    def test_focal_prior_bias(self, model_and_vars):
        model, variables = model_and_vars
        logits, _ = model.apply(variables, jnp.zeros((1, 64, 64, 3)))
        p = jax.nn.sigmoid(np.asarray(logits))
        assert 0.001 < p.mean() < 0.05  # ≈0.01 prior


class TestTargets:
    def test_assignment_bands(self):
        anchors = jnp.asarray(
            [
                [0.2, 0.2, 0.4, 0.4],   # IoU 1 → positive (class)
                [0.7, 0.7, 0.9, 0.9],   # IoU 0 → background
                [0.22, 0.22, 0.42, 0.42],  # IoU ~0.68 → positive (≥0.5)
            ]
        )
        gt = jnp.asarray([[0.2, 0.2, 0.4, 0.4]])
        tgt = rn.retinanet_targets(anchors, gt, jnp.asarray([2]), CFG)
        labels = np.asarray(tgt.labels)
        assert labels[0] == 2 and labels[1] == 0 and labels[2] == 2

    def test_ignore_band(self):
        # anchor 1 IoU ≈ 0.43 ∈ (0.4, 0.5) → ignored (-1); anchor 0 is the
        # GT's best match so force-positive doesn't touch anchor 1
        anchors = jnp.asarray([[0.2, 0.2, 0.4, 0.4], [0.28, 0.2, 0.48, 0.4]])
        gt = jnp.asarray([[0.2, 0.2, 0.4, 0.4]])
        tgt = rn.retinanet_targets(anchors, gt, jnp.asarray([1]), CFG)
        assert int(tgt.labels[1]) == -1


class TestFocalLoss:
    def test_perfect_prediction_small(self):
        logits = jnp.full((1, 4, 3), -20.0)
        logits = logits.at[0, 0, 1].set(20.0)
        labels = jnp.asarray([[2, 0, 0, 0]])
        valid = jnp.ones((1, 4), bool)
        assert float(rn.focal_loss(logits, labels, valid)) < 1e-4

    def test_ignored_anchors_excluded(self):
        logits = jnp.full((1, 2, 3), 20.0)  # confidently wrong
        labels = jnp.asarray([[0, 0]])
        only_first = jnp.asarray([[True, False]])
        both = jnp.ones((1, 2), bool)
        l1 = float(rn.focal_loss(logits, labels, only_first))
        l2 = float(rn.focal_loss(logits, labels, both))
        assert l2 > l1 > 0


class TestEndToEnd:
    def test_train_step_decreases_loss(self, model_and_vars):
        model, variables = model_and_vars
        step, tx = rn.make_retinanet_train_step(CFG)
        # the step donates its state — give it a private copy, not the
        # module-scoped fixture's buffers
        params = jax.tree.map(jnp.copy, variables["params"])
        state = (
            params,
            jax.tree.map(jnp.copy, variables.get("batch_stats", {})),
            tx.init(params),
            jnp.zeros((), jnp.int32),
        )
        rng = np.random.RandomState(0)
        batch = TrainBatch(
            images=jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 255 - 128),
            gt_boxes=jnp.asarray(
                np.array(
                    [[[0.1, 0.1, 0.45, 0.45], [0.5, 0.5, 0.9, 0.9],
                      [0, 0, 0, 0], [0, 0, 0, 0]],
                     [[0.2, 0.3, 0.6, 0.7], [0, 0, 0, 0],
                      [0, 0, 0, 0], [0, 0, 0, 0]]],
                    np.float32,
                )
            ),
            gt_class_ids=jnp.asarray([[1, 3, 0, 0], [2, 0, 0, 0]], jnp.int32),
        )
        first = None
        for i in range(4):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            total = float(metrics["total_loss"])
            assert np.isfinite(total)
            if first is None:
                first = total
        assert total < first

    def test_detections_contract(self, model_and_vars):
        model, variables = model_and_vars
        logits, deltas = model.apply(
            variables, jnp.zeros((1, 64, 64, 3))
        )
        det = rn.retinanet_detections(logits, deltas, CFG, score_threshold=0.9)
        assert det.shape == (1, CFG.detection_post_nms_instances, 6)
        # cold init with 0.01 prior: nothing above 0.9
        assert float(det[..., 5].max()) == 0.0
