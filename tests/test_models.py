"""Model-module tests: shapes, dtype policy, parameter structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetection_tpu.models.backbone import (
    FrozenBatchNorm,
    ResNetFPN,
    upsample2x_nearest,
)
from objectdetection_tpu.models.heads import BoxClassHead, MaskHead
from objectdetection_tpu.models.rpn import RPNHead


class TestFrozenBatchNorm:
    def test_identity_at_init(self):
        bn = FrozenBatchNorm()
        x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 4, 8), jnp.float32)
        variables = bn.init(jax.random.PRNGKey(0), x)
        y = bn.apply(variables, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-3)

    def test_uses_stats_not_batch(self):
        bn = FrozenBatchNorm()
        x = jnp.ones((1, 2, 2, 3)) * 100.0  # mean far from stored stats
        variables = bn.init(jax.random.PRNGKey(0), x)
        y = bn.apply(variables, x)
        # frozen: output is NOT normalized to zero mean
        assert float(jnp.abs(y).max()) > 50.0


class TestStage1Conv:
    def test_space_to_depth_equivalence(self):
        from objectdetection_tpu.models.backbone import Stage1Conv

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
        plain = Stage1Conv(space_to_depth=False, dtype=jnp.float32)
        s2d = Stage1Conv(space_to_depth=True, dtype=jnp.float32)
        variables = plain.init(jax.random.PRNGKey(0), x)
        y0 = plain.apply(variables, x)
        y1 = s2d.apply(variables, x)
        assert y0.shape == y1.shape == (2, 16, 16, 64)
        np.testing.assert_allclose(
            np.asarray(y0), np.asarray(y1), atol=1e-4
        )


class TestUpsample:
    def test_nearest_2x(self):
        x = jnp.arange(4.0).reshape(1, 2, 2, 1)
        y = np.asarray(upsample2x_nearest(x))[0, :, :, 0]
        np.testing.assert_array_equal(
            y, [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]]
        )


class TestResNetFPN:
    @pytest.fixture(scope="class")
    def built(self):
        model = ResNetFPN(model="resnet50", dtype=jnp.float32)
        x = jnp.zeros((1, 128, 128, 3))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        return model, variables

    def test_pyramid_shapes(self, built):
        model, variables = built
        x = jnp.zeros((2, 128, 128, 3))
        p2, p3, p4, p5, p6 = jax.jit(model.apply)(variables, x)
        assert p2.shape == (2, 32, 32, 256)
        assert p3.shape == (2, 16, 16, 256)
        assert p4.shape == (2, 8, 8, 256)
        assert p5.shape == (2, 4, 4, 256)
        assert p6.shape == (2, 2, 2, 256)

    def test_reference_scope_names_present(self, built):
        # h5-converter contract: reference variable scopes appear as param keys
        _, variables = built
        resnet = variables["params"]["resnet"]
        assert "conv1" in resnet
        assert "res2a_branch2a" in resnet["res2a"]
        assert "res2a_branch1" in resnet["res2a"]
        assert "res5c_branch2c" in resnet["res5c"]
        stats = variables["batch_stats"]["resnet"]
        assert "bn_conv1" in stats and "bn3b_branch2b" in stats["res3b"]

    def test_resnet101_depth(self):
        model = ResNetFPN(model="resnet101", dtype=jnp.float32)
        x = jnp.zeros((1, 64, 64, 3))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        # stage 4 must have blocks a..w (23 total) — fpn.py:200-202
        assert "res4w" in variables["params"]["resnet"]
        assert "res4x" not in variables["params"]["resnet"]


class TestRPNHead:
    def test_shared_weights_across_levels(self):
        head = RPNHead(anchors_per_location=3, dtype=jnp.float32)
        feats = [jnp.zeros((1, s, s, 256)) for s in (16, 8, 4)]
        variables = head.init(jax.random.PRNGKey(0), feats)
        # single shared conv stack — not one per level
        assert set(variables["params"].keys()) == {
            "rpn_conv_shared",
            "rpn_class_raw",
            "rpn_bbox_pred",
        }
        logits, probs, deltas = head.apply(variables, feats)
        a = 3 * (16 * 16 + 8 * 8 + 4 * 4)
        assert logits.shape == (1, a, 2)
        assert deltas.shape == (1, a, 4)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(probs, -1)), 1.0, rtol=1e-5
        )


class TestRPNHeadQuantized:
    @pytest.mark.parametrize("pc", [False, True])
    def test_fused_int8_heads_match_float(self, pc):
        """The fused single-conv int8 head path (kernels/scales/biases of
        rpn_class_raw + rpn_bbox_pred concatenated on the output axis)
        reproduces the float heads within int8 tolerance, calibrated and
        frozen, for per-tensor and per-channel act scales."""
        from objectdetection_tpu.quant import freeze_weights

        rng = np.random.RandomState(0)
        feats = [
            jnp.asarray(rng.randn(2, s, s, 64).astype(np.float32))
            for s in (16, 8)
        ]
        qhead = RPNHead(
            anchors_per_location=3, channels=64, dtype=jnp.float32,
            quantized=True, per_channel=pc,
        )
        fhead = RPNHead(
            anchors_per_location=3, channels=64, dtype=jnp.float32,
        )
        variables = qhead.init(jax.random.PRNGKey(1), feats)
        # calibrate (records shared_scale + conv act scales), then freeze
        (_, _, _), mutated = qhead.apply(variables, feats, mutable=["quant"])
        variables = {**variables, "quant": mutated["quant"]}
        frozen = freeze_weights(variables)
        lq, pq, dq = qhead.apply(frozen, feats)
        lf, pf, df = fhead.apply({"params": variables["params"]}, feats)
        # int8 path: coarse agreement (quantization noise), finite, and the
        # class/bbox split comes from the right kernel halves (a swapped
        # concat would decorrelate completely)
        corr = np.corrcoef(
            np.asarray(lq).ravel(), np.asarray(lf).ravel()
        )[0, 1]
        assert corr > 0.99, corr
        corr_d = np.corrcoef(
            np.asarray(dq).ravel(), np.asarray(df).ravel()
        )[0, 1]
        assert corr_d > 0.99, corr_d
        np.testing.assert_allclose(
            np.asarray(pq.sum(-1)), 1.0, rtol=1e-5
        )


class TestHeads:
    def test_box_head_shapes(self):
        head = BoxClassHead(num_classes=4, dtype=jnp.float32)
        pooled = jnp.asarray(
            np.random.RandomState(0).rand(2, 8, 7, 7, 256), jnp.float32
        )
        variables = head.init(jax.random.PRNGKey(0), pooled)
        logits, probs, bbox = head.apply(variables, pooled)
        assert logits.shape == (2, 8, 4)
        assert bbox.shape == (2, 8, 4, 4)
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)

    def test_mask_head_shapes_and_range(self):
        head = MaskHead(num_classes=4, dtype=jnp.float32)
        pooled = jnp.asarray(
            np.random.RandomState(0).rand(1, 6, 14, 14, 256), jnp.float32
        )
        variables = head.init(jax.random.PRNGKey(0), pooled)
        masks = head.apply(variables, pooled)
        assert masks.shape == (1, 6, 28, 28, 4)
        m = np.asarray(masks)
        assert (m >= 0).all() and (m <= 1).all()

    def test_mask_head_class_selected_matches_full(self):
        # the class_ids fast path == full prediction + take_along_axis
        head = MaskHead(num_classes=4, dtype=jnp.float32)
        pooled = jnp.asarray(
            np.random.RandomState(1).rand(2, 5, 14, 14, 256), jnp.float32
        )
        cls = jnp.asarray(
            np.random.RandomState(2).randint(0, 4, (2, 5)), jnp.int32
        )
        variables = head.init(jax.random.PRNGKey(0), pooled)
        full = head.apply(variables, pooled)  # [2, 5, 28, 28, 4]
        sel = jnp.take_along_axis(
            full, cls[:, :, None, None, None], axis=-1
        )[..., 0]
        fast = head.apply(variables, pooled, cls)
        assert fast.shape == (2, 5, 28, 28)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(sel), atol=1e-6
        )
