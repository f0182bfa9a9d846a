"""Int8 post-training quantization (quant.py).

The reference has no quantization subsystem; this is framework-native TPU
functionality (v5e int8 MXU path). Tests pin: exactness of the quantization
math on representable values, calibration bookkeeping, checkpoint param-name
compatibility, and end-to-end fp-vs-int8 detection agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetection_tpu import detector, quant
from objectdetection_tpu.config import SHAPES_CONFIG
from objectdetection_tpu.quant import (
    QuantConv,
    calibrate_variables,
    quantize_act,
    weight_qparams,
)


class TestQuantPrimitives:
    def test_quantize_act_grid_exact(self):
        # values that are exact multiples of scale/127 must roundtrip exactly
        scale = jnp.float32(6.35)
        q = np.array([-128, -127, -3, 0, 1, 64, 127], np.int8)
        x = q.astype(np.float32) * (6.35 / 127.0)
        got = quantize_act(jnp.asarray(x), scale)
        np.testing.assert_array_equal(np.asarray(got), q)

    def test_quantize_act_clips_and_zero_scale(self):
        scale = jnp.float32(1.0)
        x = jnp.asarray([10.0, -10.0])
        got = np.asarray(quantize_act(x, scale))
        np.testing.assert_array_equal(got, [127, -128])
        # scale 0 (uncalibrated) maps everything to 0 instead of NaN/garbage
        got0 = np.asarray(quantize_act(x, jnp.float32(0.0)))
        np.testing.assert_array_equal(got0, [0, 0])

    def test_weight_qparams_per_channel(self):
        rng = np.random.RandomState(0)
        k = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
        k8, sw = weight_qparams(k)
        assert k8.dtype == jnp.int8 and sw.shape == (16,)
        # per-channel scale = absmax/127, so max |q| per channel is 127
        assert int(jnp.max(jnp.abs(k8.astype(jnp.int32)))) == 127
        # dequantized error bounded by scale/2 elementwise
        err = np.asarray(jnp.abs(k8.astype(jnp.float32) * sw - k))
        assert (err <= np.asarray(sw) / 2 + 1e-7).all()


class TestQuantConv:
    def _exact_case(self):
        # inputs exact multiples of s_x, weights exact multiples of s_w:
        # the int8 conv must match the float conv bit-for-bit
        rng = np.random.RandomState(1)
        sx = 4.0 / 127.0
        x = (rng.randint(-100, 100, (2, 8, 8, 4)) * sx).astype(np.float32)
        kq = rng.randint(-127, 128, (3, 3, 4, 8))
        kq[0, 0, 0, :] = 127  # pin per-channel absmax so s_w is exactly 0.5/127
        k = (kq / 127.0 * 0.5).astype(np.float32)
        return jnp.asarray(x), jnp.asarray(k)

    def test_exact_vs_float(self):
        x, k = self._exact_case()
        conv = QuantConv(features=8, kernel_size=(3, 3))
        variables = conv.init(jax.random.PRNGKey(0), x)
        variables = {
            "params": {"kernel": k, "bias": jnp.zeros((8,))},
            "quant": {"act_scale": jnp.float32(4.0)},
        }
        y_int8 = conv.apply(variables, x)
        y_ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        np.testing.assert_allclose(
            np.asarray(y_int8), np.asarray(y_ref), rtol=0, atol=1e-5
        )

    def test_calibration_records_absmax_and_runs_float(self):
        x, k = self._exact_case()
        conv = QuantConv(features=8, kernel_size=(3, 3))
        variables = {
            "params": {"kernel": k, "bias": jnp.zeros((8,))},
            "quant": {"act_scale": jnp.float32(0.0)},
        }
        y, mutated = conv.apply(variables, x, mutable=["quant"])
        assert float(mutated["quant"]["act_scale"]) == pytest.approx(
            float(jnp.max(jnp.abs(x)))
        )
        # calibration pass output is the plain float conv
        y_ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)
        # running max: a second, smaller batch must not shrink the scale
        _, mutated2 = conv.apply(
            {**variables, "quant": mutated["quant"]}, x * 0.1, mutable=["quant"]
        )
        assert float(mutated2["quant"]["act_scale"]) == pytest.approx(
            float(mutated["quant"]["act_scale"])
        )

    def test_param_names_match_nn_conv(self):
        # checkpoint compatibility: identical param tree to flax nn.Conv
        import flax.linen as nn

        x = jnp.zeros((1, 8, 8, 4))
        q = QuantConv(features=8, kernel_size=(3, 3)).init(
            jax.random.PRNGKey(0), x
        )
        f = nn.Conv(8, (3, 3), padding="SAME").init(jax.random.PRNGKey(0), x)
        qp, fp_ = q["params"], f["params"]
        assert set(qp.keys()) == set(fp_.keys())
        for n in qp:
            assert qp[n].shape == fp_[n].shape


class TestEndToEndQuantized:
    """fp-vs-int8 agreement through the full detector on the shapes config."""

    @pytest.fixture(scope="class")
    def setup(self):
        cfg_q = SHAPES_CONFIG.replace(quantized_inference=True)
        rng = jax.random.PRNGKey(0)
        variables = detector.init_variables(cfg_q, rng)
        imgs = jnp.asarray(
            np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32)
            * 255.0
            - 128.0
        )
        windows = jnp.asarray([[0.0, 0.0, 128.0, 128.0]])
        variables = calibrate_variables(variables, imgs, cfg_q)
        return cfg_q, variables, imgs, windows

    def test_init_creates_quant_collection(self, setup):
        cfg_q, variables, _, _ = setup
        assert "quant" in variables
        scales = jax.tree_util.tree_leaves(variables["quant"])
        # stem + 3 convs per block + projections + FPN + RPN
        assert len(scales) > 50
        assert all(float(s) > 0 for s in scales)

    def test_detections_close_to_float(self, setup):
        cfg_q, variables, imgs, windows = setup
        det_q = jax.jit(
            lambda v, i, w: detector.forward_inference(v, i, w, cfg_q)
        )(variables, imgs, windows)
        cfg_f = cfg_q.replace(quantized_inference=False)
        det_f = jax.jit(
            lambda v, i, w: detector.forward_inference(v, i, w, cfg_f)
        )(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            imgs,
windows,
        )
        n = min(int(det_q.valid.sum()), int(det_f.valid.sum()), 5)
        assert n >= 1
        bq, bf = np.asarray(det_q.boxes[0, :n]), np.asarray(det_f.boxes[0, :n])
        # top detections: same classes, close scores, overlapping boxes
        np.testing.assert_array_equal(
            np.asarray(det_q.class_ids[0, :n]), np.asarray(det_f.class_ids[0, :n])
        )
        np.testing.assert_allclose(
            np.asarray(det_q.scores[0, :n]),
            np.asarray(det_f.scores[0, :n]),
            atol=0.05,
        )
        y1 = np.maximum(bq[:, 0], bf[:, 0]); x1 = np.maximum(bq[:, 1], bf[:, 1])
        y2 = np.minimum(bq[:, 2], bf[:, 2]); x2 = np.minimum(bq[:, 3], bf[:, 3])
        inter = np.clip(y2 - y1, 0, None) * np.clip(x2 - x1, 0, None)
        area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        iou = inter / (area(bq) + area(bf) - inter + 1e-9)
        assert (iou > 0.85).all(), iou
