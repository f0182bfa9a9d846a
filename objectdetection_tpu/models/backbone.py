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


class FrozenBatchNorm(nn.Module):
    """Inference-mode batch norm: y = gamma * (x - mean) / sqrt(var + eps) + beta.

    `mean`/`var` live in the ``batch_stats`` collection and are never updated
    (the reference freezes BN in all paths). Keras-compatible epsilon.
    """

    epsilon: float = 1e-3
    dtype: Any = jnp.float32
    scale_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        ).value
        inv = scale / jnp.sqrt(var + self.epsilon)
        y = x * inv.astype(self.dtype) + (bias - mean * inv).astype(self.dtype)
        return y


class BottleneckBlock(nn.Module):
    """ResNet bottleneck. ≙ fpn.py conv_block (:96-145) / identity_block (:51-94)."""

    filters: Tuple[int, int, int]
    stride: int = 1
    projection: bool = False  # conv shortcut (the reference's conv_block)
    stage: int = 2
    block: str = "a"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        f1, f2, f3 = self.filters
        conv = lambda f, k, s, name: nn.Conv(
            f,
            (k, k),
            strides=(s, s),
            padding="SAME",
            name=name,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        bn = lambda name: FrozenBatchNorm(name=name, dtype=self.dtype)
        cn = f"res{self.stage}{self.block}_branch"
        bnn = f"bn{self.stage}{self.block}_branch"

        if self.projection:
            shortcut = conv(f3, 1, self.stride, cn + "1")(x)
            shortcut = bn(bnn + "1")(shortcut)
        else:
            shortcut = x

        y = conv(f1, 1, self.stride, cn + "2a")(x)
        y = nn.relu(bn(bnn + "2a")(y))
        y = conv(f2, 3, 1, cn + "2b")(y)
        y = nn.relu(bn(bnn + "2b")(y))
        y = conv(f3, 1, 1, cn + "2c")(y)
        # zero-gamma init on the residual's last BN: blocks start as identity,
        # keeping from-scratch activations bounded (loaded checkpoints
        # overwrite the scale). Standard ResNet trainability practice.
        y = FrozenBatchNorm(
            name=bnn + "2c", dtype=self.dtype,
            scale_init=nn.initializers.zeros,
        )(y)
        return nn.relu(y + shortcut)


# identity blocks after the stage-4 conv block (fpn.py:200-202)
RESNET_STAGE4_BLOCKS = {"resnet50": 5, "resnet101": 22}


class Stage1Conv(nn.Module):
    """ResNet stem: pad 3 + conv7x7/2 VALID (fpn.py:167-172).

    `space_to_depth=True` runs the MXU-friendly equivalent: the 7x7 kernel
    zero-padded to 8x8 and regrouped as a stride-1 4x4 conv over
    2x2-blocked input. Parameter layout is identical in both modes.
    """

    space_to_depth: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, cin = x.shape
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (7, 7, cin, 64), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (64,), jnp.float32)
        dt = self.dtype
        x = x.astype(dt)
        kernel = kernel.astype(dt)

        if not self.space_to_depth or h % 2 or w % 2:
            # pad inside the conv op — an explicit jnp.pad of the full-res
            # input is a separate 100MB+ copy kernel (measured ~3ms/batch-8)
            y = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(2, 2), padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(dt)

        # out[i] = Σ_{k=0..6} x[2i + k - 3] · w[k]
        #        = Σ_{k=0..7} x[2i + k - 4] · w8[k],  w8 = [0, w]
        # With 2x2 blocks y[j] = (x[2j], x[2j+1]):
        #   out[i] = Σ_{j=0..3} y[i - 2 + j] · K[j],  K[j] = (w8[2j], w8[2j+1])
        k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # [8,8,C,64]
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

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array, Array, Array]:
        assert self.model in RESNET_STAGE4_BLOCKS
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
            space_to_depth=self.conv1_space_to_depth, dtype=dt, name="conv1"
        )(x)
        x = nn.relu(FrozenBatchNorm(name="bn_conv1", dtype=dt)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        # jax.checkpoint per block trades FLOPs for activation memory when
        # training at 1024² (SURVEY.md: remat is the TPU-native lever here)
        block_cls = nn.remat(BottleneckBlock) if self.remat else BottleneckBlock

        def stage(x, stage_idx, filters, first_stride, num_blocks):
            x = block_cls(
                filters, stride=first_stride, projection=True,
                stage=stage_idx, block="a", dtype=dt,
                name=f"res{stage_idx}a",
            )(x)
            for i in range(1, num_blocks):
                blk = chr(ord("a") + i)
                x = block_cls(
                    filters, stage=stage_idx, block=blk, dtype=dt,
                    name=f"res{stage_idx}{blk}",
                )(x)
            return x

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

    @nn.compact
    def __call__(self, images: Array) -> Tuple[Array, ...]:
        dt = self.dtype
        c2, c3, c4, c5 = ResNetBottomUp(
            model=self.model, dtype=dt,
            conv1_space_to_depth=self.conv1_space_to_depth,
            remat=self.remat, name="resnet",
        )(images)

        lat = lambda name: nn.Conv(
            self.channels, (1, 1), name=name, dtype=dt, param_dtype=jnp.float32
        )
        out = lambda name: nn.Conv(
            self.channels, (3, 3), padding="SAME", name=name,
            dtype=dt, param_dtype=jnp.float32,
        )

        m5 = lat("fpn_c5p5")(c5)
        m4 = upsample2x_nearest(m5) + lat("fpn_c4p4")(c4)
        m3 = upsample2x_nearest(m4) + lat("fpn_c3p3")(c3)
        m2 = upsample2x_nearest(m3) + lat("fpn_c2p2")(c2)

        p2 = out("fpn_p2")(m2)
        p3 = out("fpn_p3")(m3)
        p4 = out("fpn_p4")(m4)
        p5 = out("fpn_p5")(m5)
        p6 = p5[:, ::2, ::2, :]
        return p2, p3, p4, p5, p6
