"""Space-to-depth conv-basis transforms (ops/s2d.py): exact math parity."""

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_tpu.ops.s2d import (
    blocked_1x1_kernel,
    blocked_3x3_kernel,
    depth_to_space,
    space_to_depth,
    tile_channels,
)


def conv(x, k, stride=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class TestS2D:
    def test_s2d_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x)
        )

    def test_group_major_order(self):
        # channel (dy*2+dx)*C + c holds original pixel (2i+dy, 2j+dx, c)
        x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
        s = space_to_depth(x)
        assert s.shape == (2, 2, 2, 12)
        for dy in (0, 1):
            for dx in (0, 1):
                g = dy * 2 + dx
                np.testing.assert_array_equal(
                    np.asarray(s[:, :, :, g * 3 : (g + 1) * 3]),
                    np.asarray(x[:, dy::2, dx::2, :]),
                )

    def test_blocked_1x1_matches(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 16, 16, 5), jnp.float32)
        w = jnp.asarray(rng.randn(1, 1, 5, 7), jnp.float32)
        ref = conv(x, w)
        got = depth_to_space(conv(space_to_depth(x), blocked_1x1_kernel(w)))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_blocked_3x3_matches(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 16, 16, 4), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 4, 6), jnp.float32)
        ref = conv(x, w)
        got = depth_to_space(conv(space_to_depth(x), blocked_3x3_kernel(w)))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_stride2_consumer_is_channel_slice(self):
        # the (0,0) sub-pixel group equals the stride-2 subsampled tensor
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 16, 16, 4), jnp.float32)
        s = space_to_depth(x)
        np.testing.assert_array_equal(
            np.asarray(s[..., :4]), np.asarray(x[:, ::2, ::2, :])
        )

    def test_backbone_stage2_s2d_parity_float(self):
        from objectdetection_tpu.models.backbone import ResNetBottomUp

        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
        mod = ResNetBottomUp(model="resnet50", dtype=jnp.float32)
        mod_s = ResNetBottomUp(
            model="resnet50", dtype=jnp.float32, s2d_stage2=True
        )
        variables = mod.init(jax.random.PRNGKey(0), x)
        # identical param tree (layout-independent)
        vs = mod_s.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(
            variables
        ) == jax.tree_util.tree_structure(vs)
        ref = mod.apply(variables, x)
        got = mod_s.apply(variables, x)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-4
            )

    def test_backbone_stage2_s2d_parity_int8(self):
        from objectdetection_tpu.models.backbone import ResNetBottomUp
        from objectdetection_tpu.quant import freeze_weights

        rng = np.random.RandomState(6)
        x = jnp.asarray(rng.randn(1, 64, 64, 3) * 20, jnp.float32)
        mod = ResNetBottomUp(
            model="resnet50", dtype=jnp.float32, quantized=True
        )
        mod_s = ResNetBottomUp(
            model="resnet50", dtype=jnp.float32, quantized=True,
            s2d_stage2=True,
        )
        variables = mod.init(jax.random.PRNGKey(0), x)
        # calibrate BOTH layouts before freezing (QuantConv rejects
        # calibration on frozen int8 kernels)
        _, m = mod.apply(variables, x, mutable=["quant"])
        _, ms = mod_s.apply(variables, x, mutable=["quant"])
        variables = freeze_weights({**variables, "quant": m["quant"]})
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5
            ),
            m["quant"],
            ms["quant"],
        )
        # int8 inference: identical int8 values + scales -> exact int32
        # conv sums -> bit-identical carried streams
        ref = mod.apply(variables, x)
        got = mod_s.apply(variables, x)
        for (r8, rs), (g8, gs) in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(g8), np.asarray(r8))
            np.testing.assert_allclose(float(gs), float(rs), rtol=1e-6)

    def test_tile_channels_matches_bn(self):
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(2, 8, 8, 6), jnp.float32)
        gamma = jnp.asarray(rng.rand(6) + 0.5, jnp.float32)
        ref = space_to_depth(x * gamma)
        got = space_to_depth(x) * tile_channels(gamma)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)
