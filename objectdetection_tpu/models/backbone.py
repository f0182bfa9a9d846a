"""ResNet-50/101 + FPN backbone.

Architecture mirrors the reference bottom-up/top-down graphs
(`MaskRCNN/building_blocks/fpn.py:38-271`): bottleneck stages C2-C5 with
frozen BatchNorm, 1×1 lateral connections + nearest-neighbor 2× upsampling,
3×3 output convolutions P2-P5, and P6 = stride-2 subsample of P5.

TPU-native choices:
- NHWC + configurable ``compute dtype`` (bfloat16 keeps the MXU fed; params
  stay float32),
- BatchNorm is always folded as a frozen affine transform (the reference
  freezes BN everywhere: ``trainable=False`` at fpn.py:66 etc.) so XLA fuses
  conv+scale+bias+relu into one kernel,
- module names carry the reference scope names (``res2a_branch2a``,
  ``fpn_c5p5``...) so the matterport-h5 converter is a pure name map.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from objectdetection_tpu.ops.fused_block import (
    fused_block_supported,
    fused_identity_block_int8,
)
from objectdetection_tpu.ops.s2d import depth_to_space, space_to_depth
from objectdetection_tpu.quant import (
    conv_factory,
    dequantize_act,
    int8_conv,
    quantize_act,
    weight_qparams,
)


class FrozenBatchNorm(nn.Module):
    """Inference-mode batch norm: y = gamma * (x - mean) / sqrt(var + eps) + beta.

    `mean`/`var` live in the ``batch_stats`` collection and are never updated
    (the reference freezes BN in all paths). Keras-compatible epsilon.
    """

    epsilon: float = 1e-3
    dtype: Any = jnp.float32
    scale_init: Any = nn.initializers.ones
    s2d: bool = False  # input is 2x2-blocked [..., 4C]; params stay [C]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1] // 4 if self.s2d else x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        ).value
        inv = scale / jnp.sqrt(var + self.epsilon)
        shift = bias - mean * inv
        if self.s2d:
            inv, shift = jnp.tile(inv, 4), jnp.tile(shift, 4)
        y = x * inv.astype(self.dtype) + shift.astype(self.dtype)
        return y


class _QuantConvParams(nn.Module):
    """Variable-tree mirror of quant.QuantConv: declares the identical
    params ("kernel" HWIO, "bias") and quant variables ("kernel_scale",
    "act_scale") under the same module name, but performs no compute.

    Used by fusing consumers (the Pallas fused-bottleneck path, the RPN
    fused-head conv), which read the frozen int8 weights and calibrated
    scales directly — checkpoints and calibration remain layout-identical
    either way.
    """

    features: int
    kernel_size: Tuple[int, int]
    cin: int
    per_channel: bool = False  # act_scale is [cin] (QuantConv.per_channel)

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, self.cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        kernel_scale = self.variable(
            "quant",
            "kernel_scale",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        act_shape = (self.cin,) if self.per_channel else ()
        act_scale = self.variable(
            "quant", "act_scale", lambda: jnp.zeros(act_shape, jnp.float32)
        )
        return kernel, bias, kernel_scale.value, act_scale.value


class _BNParams(nn.Module):
    """Variable-tree mirror of FrozenBatchNorm returning the folded affine
    (inv, shift) instead of applying it."""

    epsilon: float = 1e-3
    scale_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(self, c: int):
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        ).value
        inv = scale / jnp.sqrt(var + self.epsilon)
        return inv, bias - mean * inv


class BottleneckBlock(nn.Module):
    """ResNet bottleneck. ≙ fpn.py conv_block (:96-145) / identity_block (:51-94)."""

    filters: Tuple[int, int, int]
    stride: int = 1
    projection: bool = False  # conv shortcut (the reference's conv_block)
    stage: int = 2
    block: str = "a"
    dtype: Any = jnp.float32
    quantized: bool = False  # int8 conv path (inference PTQ, see quant.py)
    s2d: bool = False  # 2x2-blocked basis (stride-1 stages; see ops/s2d.py)
    # run int8 identity blocks as ONE Pallas kernel (ops/fused_block.py):
    # VMEM-resident intermediates, im2col 3x3, fused requant epilogues
    fused: bool = False
    # per-input-channel activation quantization (QuantConv.per_channel):
    # the carried stream's out_scale becomes a [C3] vector
    per_channel: bool = False
    # lower measured-win 1x1 int8 convs as dots (config.int8_dot_lowering)
    dot_lowering: bool = False
    # serve this block in bf16 with dequantized int8 kernels on the
    # quantized path (config.bf16_stages — the int8_stem pattern per
    # stage). Variable layout (quant scales, out_scale) is unchanged.
    int8_compute: bool = True
    # bf16-served blocks: re-enter the int8 stream at the block output
    # (only the LAST block of a bf16 stage does, at the stage boundary)
    quantize_out: bool = False

    @nn.compact
    def __call__(self, x):
        """x: float [B,H,W,C] — or, on the int8 inference path, a carried
        ``(int8 tensor, scale)`` pair. Returns the same kind it was given.
        With ``s2d``, tensors are 2x2-blocked [B, H/2, W/2, 4C] (params and
        recorded scales are identical to the unblocked layout).

        The int8-carried residual stream is the key to the quantized
        backbone's bandwidth win: block inputs/outputs and the shortcut all
        materialize as int8 (the dequant rides the conv epilogue fusions);
        nothing in a stage's steady state touches HBM at more than 1 B/elt.
        """
        f1, f2, f3 = self.filters
        if self.s2d:
            assert self.stride == 1, "s2d blocks are stride-1 only"
        make_conv = conv_factory(
            self.quantized, self.dtype, dot_lowering=self.dot_lowering
        )
        conv = lambda f, k, s, name: make_conv(
            f, (k, k), strides=(s, s), padding="SAME", name=name,
            s2d=self.s2d, per_channel=self.per_channel,
            int8_compute=self.int8_compute,
        )
        bn = lambda name: FrozenBatchNorm(
            name=name, dtype=self.dtype, s2d=self.s2d
        )
        cn = f"res{self.stage}{self.block}_branch"
        bnn = f"bn{self.stage}{self.block}_branch"
        # constructed lazily: the fused path binds the same variables via a
        # _BNParams mirror under the same name instead
        make_bn2c = lambda: FrozenBatchNorm(
            # zero-gamma init on the residual's last BN: blocks start as
            # identity, keeping from-scratch activations bounded (loaded
            # checkpoints overwrite the scale). Standard ResNet practice.
            name=bnn + "2c", dtype=self.dtype,
            scale_init=nn.initializers.zeros, s2d=self.s2d,
        )
        if self.quantized:
            assert not (self.per_channel and self.s2d)
            os_shape = (f3,) if self.per_channel else ()
            out_scale = self.variable(
                "quant", "out_scale", lambda: jnp.zeros(os_shape, jnp.float32)
            )

        int8_stream = self.quantized and not self.is_mutable_collection("quant")
        # bf16-served block (config.bf16_stages): float activations through
        # the block, dequantized int8 kernels inside the convs. Accepts
        # either a carried (int8, scale) pair (stage boundary) or a float
        # tensor (mid-stage); emits int8 only at the stage exit.
        bf16_serve = int8_stream and not self.int8_compute
        if bf16_serve and isinstance(x, tuple):
            x = dequantize_act(x[0], x[1], self.dtype)
        if (
            int8_stream
            and self.int8_compute
            and self.fused
            and not self.per_channel  # fused kernel expects scalar scales
            and not self.projection
            and self.stride == 1
            and not self.s2d
            and fused_block_supported(x[0], f1)
        ):
            x8, sx = x
            k_a, bias_a, ks_a, _ = _QuantConvParams(
                f1, (1, 1), x8.shape[-1], name=cn + "2a"
            )()
            k_b, bias_b, ks_b, act_b = _QuantConvParams(
                f2, (3, 3), f1, name=cn + "2b"
            )()
            k_c, bias_c, ks_c, act_c = _QuantConvParams(
                f3, (1, 1), f2, name=cn + "2c"
            )()
            bn_a = _BNParams(name=bnn + "2a")(f1)
            bn_b = _BNParams(name=bnn + "2b")(f2)
            bn_c = _BNParams(
                name=bnn + "2c", scale_init=nn.initializers.zeros
            )(f3)
            # frozen weights carry (int8 kernel, kernel_scale); unfrozen
            # float kernels quantize in-trace exactly like QuantConv
            qp = lambda k, s: (k, s) if k.dtype == jnp.int8 else weight_qparams(k)
            (k_a8, sw_a), (k_b8, sw_b), (k_c8, sw_c) = (
                qp(k_a, ks_a), qp(k_b, ks_b), qp(k_c, ks_c)
            )
            y8 = fused_identity_block_int8(
                x8, sx, k_a8, k_b8, k_c8, sw_a, sw_b, sw_c,
                bias_a, bias_b, bias_c, bn_a, bn_b, bn_c,
                scale_b=act_b, scale_c=act_c, out_scale=out_scale.value,
                # interpret mode keeps the path testable off-TPU
                interpret=jax.default_backend() != "tpu",
            )
            return y8, out_scale.value

        if int8_stream and not bf16_serve:
            x8, sx = x
            if self.projection:
                shortcut = bn(bnn + "1")(
                    conv(f3, 1, self.stride, cn + "1")(x8, in_scale=sx)
                )
            else:
                shortcut = dequantize_act(x8, sx, self.dtype)
            y = conv(f1, 1, self.stride, cn + "2a")(x8, in_scale=sx)
        else:
            if self.projection:
                shortcut = bn(bnn + "1")(conv(f3, 1, self.stride, cn + "1")(x))
            else:
                shortcut = x
            y = conv(f1, 1, self.stride, cn + "2a")(x)

        y = nn.relu(bn(bnn + "2a")(y))
        y = conv(f2, 3, 1, cn + "2b")(y)
        y = nn.relu(bn(bnn + "2b")(y))
        y = conv(f3, 1, 1, cn + "2c")(y)
        out = nn.relu(make_bn2c()(y) + shortcut)

        if bf16_serve:
            if self.quantize_out:  # stage exit: re-enter the int8 stream
                return quantize_act(out, out_scale.value), out_scale.value
            return out
        if int8_stream:
            return quantize_act(out, out_scale.value), out_scale.value
        if self.quantized:  # calibration pass: record the block-output range
            a = jnp.abs(out.astype(jnp.float32))
            upd = jnp.max(a, axis=(0, 1, 2)) if self.per_channel else jnp.max(a)
            out_scale.value = jnp.maximum(out_scale.value, upd)
        return out


# identity blocks after the stage-4 conv block (fpn.py:200-202)
RESNET_STAGE4_BLOCKS = {"resnet50": 5, "resnet101": 22}


class Stage1Conv(nn.Module):
    """ResNet stem: pad 3 + conv7x7/2 VALID (fpn.py:167-172).

    `space_to_depth=True` runs the MXU-friendly equivalent: the 7x7 kernel
    zero-padded to 8x8 and regrouped as a stride-1 4x4 conv over
    2x2-blocked input. Parameter layout is identical in both modes.

    `int8_compute=False` (config.int8_stem gate) keeps the quant variables
    and calibration identical but serves the conv in bf16 with the
    DEQUANTIZED int8 kernel: the int8 path materializes a [B,512²,64]
    int32 conv output plus a separate dequant pass (conv epilogues do not
    fuse on this backend — benchmarks/backbone_audit.py microprobes),
    ~13 GB/b96 of extra HBM traffic on a compute-trivial conv (cin=3
    starves the MXU either way). Frozen artifacts load unchanged.
    """

    space_to_depth: bool = False
    dtype: Any = jnp.float32
    quantized: bool = False
    int8_compute: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, cin = x.shape
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (7, 7, cin, 64), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (64,), jnp.float32)
        dt = self.dtype
        if self.quantized:
            act_scale = self.variable(
                "quant", "act_scale", lambda: jnp.zeros((), jnp.float32)
            )
            kernel_scale = self.variable(
                "quant", "kernel_scale", lambda: jnp.ones((64,), jnp.float32)
            )
        x = x.astype(dt)
        frozen = self.quantized and kernel.dtype == jnp.int8
        if frozen:
            assert not (self.space_to_depth and h % 2 == 0 and w % 2 == 0), (
                "frozen int8 weights are not supported with the "
                "space-to-depth stem (off by default)"
            )

        if not self.space_to_depth or h % 2 or w % 2:
            if self.quantized and not self.is_mutable_collection("quant"):
                if not self.int8_compute:
                    # bf16 stem (config.int8_stem=False): same quantized
                    # WEIGHTS (int8-rounded, so frozen/unfrozen agree) but
                    # bf16 activations and a bf16 conv output — skips the
                    # act-quantize pass, the int32 materialization, and the
                    # unfused dequant pass of the int8 path.
                    if frozen:
                        k = kernel.astype(jnp.float32) * kernel_scale.value
                    else:
                        k8, sw = weight_qparams(kernel)
                        k = k8.astype(jnp.float32) * sw
                    y = jax.lax.conv_general_dilated(
                        x, k.astype(dt), window_strides=(2, 2),
                        padding=((3, 3), (3, 3)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                    return y + bias.astype(dt)
                # int8 stem: mean-subtracted pixels are naturally int8-ranged.
                # Quantize from the float32 param (NOT a dt-cast copy) so the
                # result is bit-identical to quant.freeze_weights.
                x8 = quantize_act(x, act_scale.value)
                if frozen:
                    k8, sw = kernel, kernel_scale.value
                else:
                    k8, sw = weight_qparams(kernel)
                y32 = int8_conv(x8, k8, (2, 2), ((3, 3), (3, 3)))
                y = (
                    y32.astype(jnp.float32) * (act_scale.value / 127.0 * sw)
                ).astype(dt)
                return y + bias.astype(dt)
            if self.quantized:  # calibration pass
                act_scale.value = jnp.maximum(
                    act_scale.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
                )
            # pad inside the conv op — an explicit jnp.pad of the full-res
            # input is a separate 100MB+ copy kernel (measured ~3ms/batch-8)
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(dt), window_strides=(2, 2),
                padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(dt)

        # out[i] = Σ_{k=0..6} x[2i + k - 3] · w[k]
        #        = Σ_{k=0..7} x[2i + k - 4] · w8[k],  w8 = [0, w]
        # With 2x2 blocks y[j] = (x[2j], x[2j+1]):
        #   out[i] = Σ_{j=0..3} y[i - 2 + j] · K[j],  K[j] = (w8[2j], w8[2j+1])
        k8 = jnp.pad(
            kernel.astype(dt), ((1, 0), (1, 0), (0, 0), (0, 0))
        )  # [8,8,C,64]
        k4 = (
            k8.reshape(4, 2, 8, cin, 64)  # [jy, dy, kx, c, o]
            .transpose(0, 2, 1, 3, 4)  # [jy, kx, dy, c, o]
            .reshape(4, 4, 2, 2, cin, 64)  # [jy, jx, dx, dy, c, o]
            .transpose(0, 1, 3, 2, 4, 5)  # [jy, jx, dy, dx, c, o]
            .reshape(4, 4, 2 * 2 * cin, 64)
        )
        # space-to-depth: [B, H/2, W/2, 2·2·C] with (dy, dx, c) channel order
        xs = (
            x.reshape(b, h // 2, 2, w // 2, 2, cin)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h // 2, w // 2, 2 * 2 * cin)
        )
        y = jax.lax.conv_general_dilated(
            xs, k4, window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(dt)


class ResNetBottomUp(nn.Module):
    """C2..C5 feature extractor. ≙ fpn.fpn_bottom_up_graph (fpn.py:147-219).

    Note the reference builds `1 + block_count` stage-4 blocks (a conv block
    plus ``range(block_count)`` identity blocks with block_count 5/22,
    fpn.py:200-202), i.e. 6 for R50 and 23 for R101 — standard ResNet.
    """

    model: str = "resnet101"
    dtype: Any = jnp.float32
    conv1_space_to_depth: bool = False
    remat: bool = False  # rematerialize blocks in the backward pass
    quantized: bool = False
    s2d_stage2: bool = False  # run stage 2 in the 2x2-blocked basis
    fused_bottleneck: bool = False  # Pallas fused int8 identity blocks
    per_channel: bool = False  # per-channel act quant (config.per_channel_acts)
    dot_lowering: bool = False  # config.int8_dot_lowering
    int8_stem: bool = True  # config.int8_stem (bf16 conv1 when False)
    bf16_stages: Tuple[int, ...] = ()  # config.bf16_stages

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array, Array, Array]:
        assert self.model in RESNET_STAGE4_BLOCKS
        assert not (self.per_channel and self.s2d_stage2), (
            "per_channel_acts and s2d_stage2 are mutually exclusive"
        )
        assert set(self.bf16_stages) <= {2, 3, 4, 5}
        assert not (self.s2d_stage2 and 2 in self.bf16_stages), (
            "s2d_stage2 and a bf16 stage 2 are mutually exclusive"
        )
        dt = self.dtype
        x = x.astype(dt)

        # Stage 1: pad 3, conv7x7/2 VALID, BN, relu, maxpool3x3/2 SAME.
        # A stride-2 7x7 conv on 3 channels starves the MXU (3 of 128 lanes
        # used); the space-to-depth form is the standard TPU rewrite: the
        # same parameters [7,7,3,64] are zero-padded to an 8x8 kernel and
        # reshaped into a stride-1 4x4 conv over 2x2-blocked 12-channel
        # input — mathematically identical output, checkpoint layout
        # unchanged (conv1/kernel stays [7,7,3,64]).
        x = Stage1Conv(
            space_to_depth=self.conv1_space_to_depth, dtype=dt,
            quantized=self.quantized, int8_compute=self.int8_stem,
            name="conv1",
        )(x)
        x = nn.relu(FrozenBatchNorm(name="bn_conv1", dtype=dt)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        if self.quantized:
            pc = self.per_channel and not self.s2d_stage2
            c1_scale = self.variable(
                "quant",
                "c1_out_scale",
                lambda: jnp.zeros((64,) if pc else (), jnp.float32),
            )
            if self.is_mutable_collection("quant"):  # calibration
                a = jnp.abs(x.astype(jnp.float32))
                upd = jnp.max(a, axis=(0, 1, 2)) if pc else jnp.max(a)
                c1_scale.value = jnp.maximum(c1_scale.value, upd)
            elif 2 not in self.bf16_stages:
                # enter the int8-carried stream: stages pass (int8, scale)
                # pairs between blocks (see BottleneckBlock docstring).
                # With a bf16 stage 2 the stream starts at that stage's
                # exit instead — skipping the stem-output quantize pass.
                x = (quantize_act(x, c1_scale.value), c1_scale.value)

        # jax.checkpoint per block trades FLOPs for activation memory when
        # training at 1024² (SURVEY.md: remat is the TPU-native lever here)
        block_cls = nn.remat(BottleneckBlock) if self.remat else BottleneckBlock

        def stage(x, stage_idx, filters, first_stride, num_blocks, s2d=False):
            # bf16-served stage (config.bf16_stages): blocks run float and
            # only the LAST block re-quantizes — and only when the next
            # stage is int8 (a float c_i feeds the FPN laterals fine)
            i8c = stage_idx not in self.bf16_stages
            requant = stage_idx + 1 not in self.bf16_stages
            x = block_cls(
                filters, stride=first_stride, projection=True,
                stage=stage_idx, block="a", dtype=dt,
                quantized=self.quantized, s2d=s2d,
                per_channel=self.per_channel,
                dot_lowering=self.dot_lowering,
                int8_compute=i8c,
                quantize_out=num_blocks == 1 and requant,
                name=f"res{stage_idx}a",
            )(x)
            for i in range(1, num_blocks):
                blk = chr(ord("a") + i)
                x = block_cls(
                    filters, stage=stage_idx, block=blk, dtype=dt,
                    quantized=self.quantized, s2d=s2d,
                    fused=self.fused_bottleneck,
                    per_channel=self.per_channel,
                    dot_lowering=self.dot_lowering,
                    int8_compute=i8c,
                    quantize_out=i == num_blocks - 1 and requant,
                    name=f"res{stage_idx}{blk}",
                )(x)
            return x

        use_s2d = self.s2d_stage2 and x.shape[1] % 2 == 0 if not isinstance(
            x, tuple
        ) else self.s2d_stage2 and x[0].shape[1] % 2 == 0
        if use_s2d:
            # stage 2's 64-channel convs pad to 128 lanes at full spatial
            # resolution (measured 14-52 TF/s vs 185 in the blocked basis,
            # benchmarks/narrow_conv_probe.py) — run the whole stage on
            # 2x2-blocked [B, H/2, W/2, 4C] tensors (identical math and
            # identical params/scales), then unblock for the consumers.
            if isinstance(x, tuple):
                x = (space_to_depth(x[0]), x[1])
            else:
                x = space_to_depth(x)
            c2b = stage(x, 2, (64, 64, 256), 1, 3, s2d=True)
            if isinstance(c2b, tuple):
                c2 = (depth_to_space(c2b[0]), c2b[1])
            else:
                c2 = depth_to_space(c2b)
        else:
            c2 = stage(x, 2, (64, 64, 256), 1, 3)
        c3 = stage(c2, 3, (128, 128, 512), 2, 4)
        c4 = stage(c3, 4, (256, 256, 1024), 2, 1 + RESNET_STAGE4_BLOCKS[self.model])
        c5 = stage(c4, 5, (512, 512, 2048), 2, 3)
        return c2, c3, c4, c5


def upsample2x_nearest(x: Array) -> Array:
    """[B, H, W, C] → [B, 2H, 2W, C] nearest neighbor (≙ KL.UpSampling2D)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class ResNetFPN(nn.Module):
    """Full backbone: image → (P2, P3, P4, P5, P6).

    ≙ FPN.get_fpn_graph (fpn.py:221-270). P6 is a stride-2 subsample of P5
    (the reference's pool_size-1 stride-2 max pool is exactly subsampling).
    """

    model: str = "resnet101"
    channels: int = 256
    dtype: Any = jnp.float32
    conv1_space_to_depth: bool = False
    remat: bool = False
    quantized: bool = False
    s2d_stage2: bool = False
    fused_bottleneck: bool = False
    per_channel: bool = False
    # keep the finest level's convs (fpn_c2p2 + fpn_p2) in float on an
    # otherwise-int8 path (config.quantize_fpn_p2=False): P2 feeds most
    # mask ROIAlign samples
    quantize_p2: bool = True
    dot_lowering: bool = False  # config.int8_dot_lowering
    int8_stem: bool = True  # config.int8_stem (bf16 conv1 when False)
    bf16_stages: Tuple[int, ...] = ()  # config.bf16_stages

    @nn.compact
    def __call__(self, images: Array) -> Tuple[Array, ...]:
        dt = self.dtype
        c2, c3, c4, c5 = ResNetBottomUp(
            model=self.model, dtype=dt,
            conv1_space_to_depth=self.conv1_space_to_depth,
            remat=self.remat, quantized=self.quantized,
            s2d_stage2=self.s2d_stage2,
            fused_bottleneck=self.fused_bottleneck,
            per_channel=self.per_channel,
            dot_lowering=self.dot_lowering, int8_stem=self.int8_stem,
            bf16_stages=self.bf16_stages,
            name="resnet",
        )(images)

        make_conv = conv_factory(
            self.quantized, dt, dot_lowering=self.dot_lowering
        )
        out = lambda name: make_conv(
            self.channels, (3, 3), padding="SAME", name=name,
            per_channel=self.per_channel,
        )
        mk_lat = lambda name: make_conv(
            self.channels, (1, 1), name=name, per_channel=self.per_channel
        )
        int8_stream = self.quantized and not self.is_mutable_collection(
            "quant"
        )
        if int8_stream:
            # stages emitted (int8, scale) pairs — laterals consume directly.
            # A bf16-served stage followed by another bf16 stage emits a
            # FLOAT c_i instead (no requantize at that boundary); the
            # QuantConv lateral then quantizes with its own act_scale.
            lat = lambda name, c: (
                mk_lat(name)(c[0], in_scale=c[1])
                if isinstance(c, tuple)
                else mk_lat(name)(c)
            )
        else:
            lat = lambda name, c: mk_lat(name)(c)

        # float-P2 gate: the finest level's two convs stay float on an
        # otherwise-int8 path (same param layout via nn.Conv-compatible
        # names through conv_factory(False))
        if self.quantized and not self.quantize_p2:
            make_float = conv_factory(False, dt)
            lat_p2_conv = make_float(self.channels, (1, 1), name="fpn_c2p2")
            out_p2 = make_float(
                self.channels, (3, 3), padding="SAME", name="fpn_p2"
            )
            if int8_stream:
                from objectdetection_tpu.quant import dequantize_act

                lat_p2 = lambda c: lat_p2_conv(
                    dequantize_act(c[0], c[1], dt)
                    if isinstance(c, tuple)
                    else c
                )
            else:
                lat_p2 = lambda c: lat_p2_conv(c)
        else:
            lat_p2 = lambda c: lat("fpn_c2p2", c)
            out_p2 = out("fpn_p2")

        m5 = lat("fpn_c5p5", c5)
        m4 = upsample2x_nearest(m5) + lat("fpn_c4p4", c4)
        m3 = upsample2x_nearest(m4) + lat("fpn_c3p3", c3)
        m2 = upsample2x_nearest(m3) + lat_p2(c2)

        p2 = out_p2(m2)
        p3 = out("fpn_p3")(m3)
        p4 = out("fpn_p4")(m4)
        p5 = out("fpn_p5")(m5)
        p6 = p5[:, ::2, ::2, :]
        return p2, p3, p4, p5, p6
