"""Region Proposal Network head.

≙ the reference RPN (`MaskRCNN/building_blocks/rpn.py:19-165`): a shared 3×3
conv(512) + relu, then 1×1 convs producing 2·k class logits and 4·k box
deltas per location, reshaped to ``[B, H·W·k, 2|4]``.

The reference instantiates one RPN per pyramid level with shared weights and
runs them in a host Python loop with numpy round-trips between levels
(`inference.py:111-134`). Here one module is applied to every level inside a
single jitted program; outputs concatenate along the anchor axis in P2→P6
order, matching the anchor table layout from ``anchors.py``.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from objectdetection_tpu.quant import conv_factory, quantize_act


class RPNHead(nn.Module):
    anchors_per_location: int = 3
    anchor_stride: int = 1
    channels: int = 512
    dtype: Any = jnp.float32
    quantized: bool = False
    per_channel: bool = False  # per-channel act quant (config.per_channel_acts)

    @nn.compact
    def __call__(
        self,
        feature_maps: Sequence[Array],
        return_quantized_inputs: bool = False,
    ):
        """[B, H_l, W_l, C] per level → (logits, probs, deltas) over all anchors.

        Returns logits [B, A, 2], probs [B, A, 2], deltas [B, A, 4] with
        A = Σ_l H_l·W_l·k in pyramid order.

        When quantized, each shared-weight conv also shares ONE activation
        scale across levels (calibration max-reduces over all level calls).

        `return_quantized_inputs` (int8 inference path only) appends a
        fourth output ``(x8_levels, scale)``: the int8 copies of the input
        P-levels the shared conv quantized anyway (one shared act scale —
        scalar, or [C] with per-channel acts). The ROIAlign kernel reads
        these instead of the bf16 pyramid (config.int8_align_inputs),
        halving its patch-DMA bytes at zero extra quantize passes. On the
        calibration/float path the fourth output is ``None``.
        """
        k = self.anchors_per_location
        s = self.anchor_stride
        dt = self.dtype
        make_conv = conv_factory(self.quantized, dt)
        pc = self.per_channel
        shared_conv = make_conv(
            self.channels, (3, 3), strides=(s, s), padding="SAME",
            name="rpn_conv_shared", per_channel=pc,
        )

        if self.quantized:
            # one shared activation scale for the relu'd shared-conv output:
            # quantize it ONCE per level and feed the int8 tensor to both
            # 1x1 heads. Without this each head re-quantizes the same
            # [B, H, W, 512] tensor (the P2 copy alone is ~1 GB bf16 at
            # batch 32) and the shared output materializes in bf16 instead
            # of int8.
            shared_scale = self.variable(
                "quant",
                "shared_scale",
                lambda: jnp.zeros((self.channels,) if pc else (), jnp.float32),
            )

        int8_infer = self.quantized and not self.is_mutable_collection("quant")
        if int8_infer:
            # Fused-head int8 path: ONE 2k+4k-output conv instead of two
            # 1x1s, so the int8 shared tensor (P2: ~1.6 GB at batch 96) is
            # read once, not twice. Both heads consume the same input scale
            # (shared_scale), so their int8 kernels, per-output-channel
            # scales, and biases concat directly on the output axis — the
            # summations are identical, the result is bit-equal to two
            # separate QuantConvs. Params stay split (declared via
            # _QuantConvParams mirrors) for checkpoint-layout parity.
            from objectdetection_tpu.models.backbone import _QuantConvParams
            from objectdetection_tpu.quant import ACT_QMAX, weight_qparams

            k_c, b_c, ks_c, _ = _QuantConvParams(
                2 * k, (1, 1), self.channels, per_channel=pc,
                name="rpn_class_raw",
            )()
            k_d, b_d, ks_d, _ = _QuantConvParams(
                4 * k, (1, 1), self.channels, per_channel=pc,
                name="rpn_bbox_pred",
            )()

            def prep(kern, ks):
                if kern.dtype == jnp.int8:  # frozen offline (pre-folded)
                    return kern, ks
                if pc:
                    kern = kern * (shared_scale.value / ACT_QMAX).reshape(
                        1, 1, -1, 1
                    )
                return weight_qparams(kern)

            (k8c, swc), (k8d, swd) = prep(k_c, ks_c), prep(k_d, ks_d)
            k8f = jnp.concatenate([k8c, k8d], axis=-1)  # [1, 1, C, 6k]
            sw_f = jnp.concatenate([swc, swd])
            post = sw_f if pc else (shared_scale.value / ACT_QMAX) * sw_f
            bias_f = jnp.concatenate([b_c, b_d])
        else:
            class_conv = make_conv(2 * k, (1, 1), name="rpn_class_raw",
                                   per_channel=pc)
            bbox_conv = make_conv(4 * k, (1, 1), name="rpn_bbox_pred",
                                  per_channel=pc)

        logits_all: List[Array] = []
        deltas_all: List[Array] = []
        x8_levels: List[Array] = []
        in_scale = None
        for fm in feature_maps:
            if int8_infer and return_quantized_inputs:
                y, (x8, in_scale) = shared_conv(fm, return_x8=True)
                shared = nn.relu(y)
                x8_levels.append(x8)
            else:
                shared = nn.relu(shared_conv(fm))
            b = shared.shape[0]
            if int8_infer:
                from objectdetection_tpu.quant import int8_conv

                s8 = quantize_act(shared, shared_scale.value)
                y32 = int8_conv(s8, k8f, (1, 1), "SAME")
                y = (y32.astype(jnp.float32) * post).astype(dt)
                y = y + bias_f.astype(dt)
                logits = y[..., : 2 * k]
                deltas = y[..., 2 * k :]
            else:
                if self.quantized:  # calibration: record across all levels
                    a = jnp.abs(shared.astype(jnp.float32))
                    upd = jnp.max(a, axis=(0, 1, 2)) if pc else jnp.max(a)
                    shared_scale.value = jnp.maximum(shared_scale.value, upd)
                logits = class_conv(shared)
                deltas = bbox_conv(shared)
            logits_all.append(logits.reshape(b, -1, 2))
            deltas_all.append(deltas.reshape(b, -1, 4))

        logits = jnp.concatenate(logits_all, axis=1).astype(jnp.float32)
        deltas = jnp.concatenate(deltas_all, axis=1).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        if return_quantized_inputs:
            q = (x8_levels, in_scale) if int8_infer else None
            return logits, probs, deltas, q
        return logits, probs, deltas
