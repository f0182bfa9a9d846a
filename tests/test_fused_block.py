"""Fused int8 bottleneck block (ops/fused_block.py) == the unfused int8
QuantConv/FrozenBatchNorm chain, in Pallas interpret mode.

The reference below mirrors quant.QuantConv's int8 inference math + the
FrozenBatchNorm affine + the carried-stream requant of
models/backbone.BottleneckBlock (≙ reference fpn.py:51-94 identity_block),
with f32 epilogues (the fused kernel's arithmetic). Agreement is exact up
to 1 int8 step on round-boundary values (f32 multiply associativity of the
folded scales).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetection_tpu.ops.fused_block import (
    TH,
    fused_block_supported,
    fused_identity_block_int8,
)
from objectdetection_tpu.quant import quantize_act


def ref_block(x8, sx, ka8, kb8, kc8, sw, biases, bns, s_b, s_c, s_out):
    """Straight-line unfused int8 identity block with f32 epilogues."""
    sw_a, sw_b, sw_c = sw
    bias_a, bias_b, bias_c = biases
    (inv_a, sh_a), (inv_b, sh_b), (inv_c, sh_c) = bns

    def conv(x, k, pad):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    t1 = conv(x8, ka8, "VALID").astype(jnp.float32)
    m1 = jnp.maximum((t1 * (sx / 127.0 * sw_a) + bias_a) * inv_a + sh_a, 0.0)
    m1_8 = quantize_act(m1, s_b)
    t2 = conv(m1_8, kb8, "SAME").astype(jnp.float32)
    m2 = jnp.maximum((t2 * (s_b / 127.0 * sw_b) + bias_b) * inv_b + sh_b, 0.0)
    m2_8 = quantize_act(m2, s_c)
    t3 = conv(m2_8, kc8, "VALID").astype(jnp.float32)
    y = (t3 * (s_c / 127.0 * sw_c) + bias_c) * inv_c + sh_c
    out = jnp.maximum(y + x8.astype(jnp.float32) * (sx / 127.0), 0.0)
    return quantize_act(out, s_out)


def make_case(rng, b, h, w, c3, c1):
    x8 = jnp.asarray(rng.randint(-128, 128, (b, h, w, c3)), jnp.int8)
    k = lambda *s: jnp.asarray(rng.randint(-127, 128, s), jnp.int8)
    v = lambda n, lo=0.5, hi=1.5: jnp.asarray(
        rng.uniform(lo, hi, (n,)).astype(np.float32)
    )
    case = dict(
        x8=x8,
        sx=jnp.float32(3.0),
        ka8=k(1, 1, c3, c1),
        kb8=k(3, 3, c1, c1),
        kc8=k(1, 1, c1, c3),
        sw=(v(c1) * 0.01, v(c1) * 0.002, v(c3) * 0.01),
        biases=(v(c1, -0.2, 0.2), v(c1, -0.2, 0.2), v(c3, -0.2, 0.2)),
        bns=(
            (v(c1), v(c1, -0.3, 0.3)),
            (v(c1), v(c1, -0.3, 0.3)),
            (v(c3), v(c3, -0.3, 0.3)),
        ),
        s_b=jnp.float32(4.0),
        s_c=jnp.float32(5.0),
        s_out=jnp.float32(6.0),
    )
    return case


def run_fused(case, interpret=True):
    return fused_identity_block_int8(
        case["x8"],
        case["sx"],
        case["ka8"],
        case["kb8"],
        case["kc8"],
        *case["sw"],
        *case["biases"],
        case["bns"][0],
        case["bns"][1],
        case["bns"][2],
        case["s_b"],
        case["s_c"],
        case["s_out"],
        interpret=interpret,
    )


class TestFusedBlock:
    @pytest.mark.parametrize(
        "h,w,c3,c1",
        [
            (2 * TH, 8, 64, 64),  # stage-2-like narrow channels
            (2 * TH, 4, 128, 64),  # wider stream
            (3 * TH, 16, 64, 64),  # interior tiles exercised
        ],
    )
    def test_matches_unfused_reference(self, h, w, c3, c1):
        rng = np.random.RandomState(0)
        case = make_case(rng, 1, h, w, c3, c1)
        want = ref_block(
            case["x8"], case["sx"], case["ka8"], case["kb8"], case["kc8"],
            case["sw"], case["biases"], case["bns"],
            case["s_b"], case["s_c"], case["s_out"],
        )
        got = run_fused(case)
        diff = np.abs(
            np.asarray(want, np.int32) - np.asarray(got, np.int32)
        )
        # f32 scale-folding associativity may flip round boundaries by 1
        assert diff.max() <= 1, diff.max()
        assert (diff > 0).mean() < 5e-3, (diff > 0).mean()

    def test_batch_tiles(self):
        rng = np.random.RandomState(1)
        case = make_case(rng, 2, 2 * TH, 8, 64, 64)
        want = ref_block(
            case["x8"], case["sx"], case["ka8"], case["kb8"], case["kc8"],
            case["sw"], case["biases"], case["bns"],
            case["s_b"], case["s_c"], case["s_out"],
        )
        got = run_fused(case)
        diff = np.abs(np.asarray(want, np.int32) - np.asarray(got, np.int32))
        assert diff.max() <= 1

    def test_supported_gate(self):
        x = jnp.zeros((1, 2 * TH, 8, 64), jnp.int8)
        assert fused_block_supported(x, 64)
        assert not fused_block_supported(x.astype(jnp.bfloat16), 64)
        assert not fused_block_supported(
            jnp.zeros((1, 8, 8, 64), jnp.int8), 64
        )  # single tile at the smallest tiling
        assert not fused_block_supported(
            jnp.zeros((1, 2 * TH + 1, 8, 64), jnp.int8), 64
        )  # ragged height


@pytest.mark.slow  # compile/interpret-heavy: run via `pytest -m ""` or CI
class TestFusedBackboneIntegration:
    """ResNetBottomUp with fused_bottleneck on == off (int8, frozen), i.e.
    the _QuantConvParams/_BNParams mirrors bind the same variables and the
    kernel computes the same blocks (interpret mode off-TPU)."""

    def test_bottomup_fused_matches_unfused(self):
        from objectdetection_tpu import quant
        from objectdetection_tpu.models.backbone import ResNetBottomUp

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)

        def make(fused):
            return ResNetBottomUp(
                model="resnet50", dtype=jnp.float32, quantized=True,
                fused_bottleneck=fused,
            )

        variables = make(False).init(jax.random.PRNGKey(0), x)
        # calibrate (records act/out scales), then freeze weights offline
        _, mut = make(False).apply(variables, x, mutable=["quant"])
        variables = quant.freeze_weights({**variables, "quant": mut["quant"]})

        outs_ref = make(False).apply(variables, x)
        outs_fused = make(True).apply(variables, x)
        # stage 2 (16x16 here) meets the fused gate; later stages fall back
        for i, (a, b) in enumerate(zip(outs_ref, outs_fused)):
            a8, sa = a
            b8, sb = b
            assert np.asarray(sa) == np.asarray(sb)
            diff = np.abs(
                np.asarray(a8, np.int32) - np.asarray(b8, np.int32)
            )
            # identical quant grid; f32-vs-bf16 epilogues may flip ~1 step
            assert diff.max() <= 2, (i, diff.max())
            assert (diff > 1).mean() < 1e-3, (i, (diff > 1).mean())
