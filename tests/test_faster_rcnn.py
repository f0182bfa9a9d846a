"""Faster R-CNN family tests (ZF anchors, proposal filtering, full forward)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetection_tpu.config import FasterRCNNConfig
from objectdetection_tpu.models import faster_rcnn as fr
from objectdetection_tpu.models.vgg16 import VGG16

CFG = FasterRCNNConfig(
    pre_nms_top_n_test=256, post_nms_top_n_test=32,
    pre_nms_top_n_train=256, post_nms_top_n_train=64,
)


class TestZFAnchors:
    def test_base_anchor_table(self):
        # golden values from proposals.py:188-196
        a = fr.ZF_ANCHORS
        assert a.shape == (9, 4)
        np.testing.assert_array_equal(a[0], [-84, -40, 99, 55])
        np.testing.assert_array_equal(a[8], [-168, -344, 183, 359])

    def test_grid_shift_layout(self):
        g = fr.zf_grid_anchors((14, 14), 16)
        assert g.shape == (14 * 14 * 9, 4)
        # first 9 = base anchors at shift 0 (proposals.py:444-452)
        np.testing.assert_array_equal(g[:9], fr.ZF_ANCHORS)
        # next 9 = shifted +16 in x
        np.testing.assert_array_equal(g[9:18], fr.ZF_ANCHORS + [16, 0, 16, 0])
        # row stride shifts +16 in y
        np.testing.assert_array_equal(
            g[9 * 14 : 9 * 14 + 9], fr.ZF_ANCHORS + [0, 16, 0, 16]
        )

    def test_decode_plus_one_convention(self):
        anchors = jnp.asarray([[0.0, 0.0, 9.0, 19.0]])  # w=10, h=20 (+1)
        deltas = jnp.zeros((1, 4))
        out = np.asarray(fr.decode_zf_deltas(anchors, deltas))
        np.testing.assert_allclose(out[0], [0, 0, 10, 20], atol=1e-5)
        # dw = log(2) doubles the +1 width
        out2 = np.asarray(
            fr.decode_zf_deltas(anchors, jnp.asarray([[0.0, 0, np.log(2), 0]]))
        )
        np.testing.assert_allclose(out2[0, 2] - out2[0, 0], 20, atol=1e-4)


class TestProposalLayer:
    def test_min_size_and_budget(self):
        rng = np.random.RandomState(0)
        fg = jnp.asarray(rng.rand(1, 14, 14, 9).astype(np.float32))
        deltas = jnp.asarray(rng.randn(1, 14, 14, 9, 4).astype(np.float32) * 0.1)
        props, valid = fr.zf_proposal_layer(fg, deltas, CFG)
        assert props.shape == (1, 32, 4)
        p = np.asarray(props)[0][np.asarray(valid)[0]]
        # clipped to image
        assert (p[:, [0, 2]] <= 223).all() and (p >= 0).all()
        # min-size respected
        assert ((p[:, 2] - p[:, 0] + 1) >= 16).all()
        assert ((p[:, 3] - p[:, 1] + 1) >= 16).all()


class TestVGG16:
    def test_feature_map_shape(self):
        model = VGG16()
        x = jnp.zeros((1, 224, 224, 3))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        fm = model.apply(variables, x)
        assert fm.shape == (1, 14, 14, 512)
        names = set(variables["params"].keys())
        assert {"conv1_1", "conv3_3", "conv5_3"} <= names


class TestTraining:
    def test_zf_encode_decode_roundtrip(self):
        rng = np.random.RandomState(0)
        a = rng.rand(16, 4).astype(np.float32) * 100
        a[:, 2:] += a[:, :2] + 5
        g = rng.rand(16, 4).astype(np.float32) * 100
        g[:, 2:] += g[:, :2] + 5
        d = fr.encode_zf_deltas(jnp.asarray(a), jnp.asarray(g))
        rec = np.asarray(fr.decode_zf_deltas(jnp.asarray(a), d))
        # the legacy +1 convention round-trips corners to (x1, y1, x2+1, y2+1)
        # — exactly the reference's own decode arithmetic (proposals.py:306-309)
        expected = g + np.array([0, 0, 1, 1], np.float32)
        np.testing.assert_allclose(rec, expected, rtol=1e-4, atol=1e-2)

    def test_train_step_losses_finite_and_decrease(self):
        from objectdetection_tpu import faster_rcnn_train as ft

        cfg = CFG.replace(
            image_shape=(64, 64, 3),
            pre_nms_top_n_train=128, post_nms_top_n_train=32,
            train_rois_per_image=8, rpn_train_anchors_per_image=32,
        )
        state = ft.create_train_state(cfg, jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        batch = ft.FasterRCNNBatch(
            images=jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32)),
            gt_boxes=jnp.asarray(
                np.array(
                    [[[5, 5, 40, 40], [20, 30, 60, 62]],
                     [[10, 10, 50, 50], [0, 0, 0, 0]]],
                    np.float32,
                )
            ),
            gt_class_ids=jnp.asarray([[1, 2], [3, 0]], jnp.int32),
        )
        step = ft.make_train_step(cfg)
        first = None
        for i in range(4):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            total = float(metrics["total_loss"])
            assert np.isfinite(total), metrics
            if first is None:
                first = total
        assert total < first
        assert int(state.step) == 4


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        cfg = CFG.replace(image_shape=(64, 64, 3))
        model = fr.FasterRCNN(config=cfg)
        x = jnp.zeros((1, 64, 64, 3))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        return cfg, model, variables

    def test_forward_and_postprocess(self, model_and_vars):
        cfg, model, variables = model_and_vars
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
        out = jax.jit(model.apply)(variables, x)
        assert out["feature_map"].shape == (2, 4, 4, 512)
        assert out["proposals"].shape == (2, 32, 4)
        assert out["class_probs"].shape == (2, 32, cfg.num_classes)
        assert out["bbox"].shape == (2, 32, cfg.num_classes, 4)
        det = fr.faster_rcnn_detections(out, cfg, score_threshold=0.1)
        assert det.boxes.shape == (2, 50, 4)
        assert np.isfinite(np.asarray(det.boxes)).all()
