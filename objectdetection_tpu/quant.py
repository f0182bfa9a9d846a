"""Int8 post-training quantization for the inference path.

The v5e MXU executes int8 matmuls/convs at twice the bf16 rate and int8
activations halve HBM traffic — on the bandwidth-bound backbone (CLAUDE.md
perf table) this is the dominant remaining throughput lever. The reference
has no quantization story (it is a TF1 CPU educational repo); this module is
framework-native functionality, analogous to what the TF runtime would call
a quantized graph rewrite.

Scheme (standard symmetric PTQ):
  * activations: per-tensor symmetric int8, scale calibrated as the absmax
    observed over calibration batches (`calibrate_variables`),
  * weights: per-output-channel symmetric int8, quantized from the stored
    float parameters at apply time (parameter names/layouts are identical to
    ``nn.Conv``, so matterport-h5 / orbax checkpoints load unchanged),
  * compute: ``lax.conv_general_dilated(int8, int8) -> int32`` (MXU), then a
    fused epilogue ``y_i32 * (s_x * s_w[c]) + bias`` in the compute dtype.
    XLA fuses the dequant/affine/relu/requant chains into the conv epilogues
    so intra-block tensors materialize as int8.

Calibration reuses the exact float forward: :class:`QuantConv` auto-detects
calibration mode via ``is_mutable_collection("quant")`` — running any model
method with ``mutable=["quant"]`` records running absmax scales and computes
float outputs; running without mutability uses the int8 fast path with the
recorded scales.

Inference only: the int8 path is not differentiable (round/clip) and is
gated behind ``DetectorConfig.quantized_inference``.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

# int8 symmetric range. We use the full [-128, 127] for activations after
# relu (non-negative, so the asymmetry is irrelevant) and [-127, 127] for
# weights (symmetric, avoids the -128 corner).
ACT_QMAX = 127.0
W_QMAX = 127.0


def quantize_act(x: Array, scale: Array) -> Array:
    """Symmetric per-tensor activation quantization to int8."""
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    q = jnp.round(x.astype(jnp.float32) * (ACT_QMAX * inv))
    return jnp.clip(q, -128.0, 127.0).astype(jnp.int8)


def dequantize_act(x8: Array, scale: Array, dtype: Any = jnp.float32) -> Array:
    """Inverse of :func:`quantize_act` (up to rounding)."""
    return (x8.astype(jnp.float32) * (scale / ACT_QMAX)).astype(dtype)


def weight_qparams(kernel: Array) -> Tuple[Array, Array]:
    """Per-output-channel symmetric int8 quantization of an HWIO kernel.

    Returns (int8 kernel, float32 per-channel scale s_w) with
    ``kernel ≈ k8 * s_w``.
    """
    k = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(k), axis=tuple(range(k.ndim - 1)))
    sw = jnp.maximum(absmax, 1e-30) / W_QMAX
    k8 = jnp.clip(jnp.round(k / sw), -127.0, 127.0).astype(jnp.int8)
    return k8, sw


class QuantConv(nn.Module):
    """Drop-in conv with an int8 inference path and float calibration path.

    Parameter names and layouts ("kernel" HWIO, "bias" [out]) match
    ``flax.linen.Conv`` so existing checkpoints and the matterport-h5
    converter work unchanged. The activation scale lives in the ``quant``
    variable collection; apply with ``mutable=["quant"]`` to (re)calibrate.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, in_scale: Array | None = None) -> Array:
        """Apply the conv.

        Args:
          x: float activations — or, when `in_scale` is given on the int8
            inference path, an int8 tensor already quantized with that scale
            (the int8-carried residual stream of the ResNet stages; avoids a
            separate requantize kernel and a bf16 materialization).
          in_scale: activation scale of a pre-quantized int8 `x`.
        """
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        # running absmax of the conv input, recorded during calibration
        act_scale = self.variable(
            "quant", "act_scale", lambda: jnp.zeros((), jnp.float32)
        )

        padding = self.padding
        if not isinstance(padding, str):
            padding = tuple(tuple(p) for p in padding)

        if self.is_mutable_collection("quant"):
            # --- calibration: exact float forward + absmax recording ---
            act_scale.value = jnp.maximum(
                act_scale.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
            )
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=self.strides,
                padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            # --- int8 inference ---
            if in_scale is not None:
                sx = in_scale / ACT_QMAX
                x8 = x  # already int8 on the carried residual stream
            else:
                sx = act_scale.value / ACT_QMAX
                x8 = quantize_act(x, act_scale.value)
            k8, sw = weight_qparams(kernel)
            y32 = jax.lax.conv_general_dilated(
                x8,
                k8,
                window_strides=self.strides,
                padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y = y32.astype(jnp.float32) * (sx * sw)
            y = y.astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


def conv_factory(quantized: bool, dtype: Any):
    """Returns a `(features, kernel, strides, padding, name) -> Module`
    constructor: ``nn.Conv`` normally, :class:`QuantConv` when quantized.
    """

    def make(features, kernel_size, strides=(1, 1), padding="SAME", name=None):
        if quantized:
            return QuantConv(
                features=features,
                kernel_size=kernel_size,
                strides=strides,
                padding=padding,
                dtype=dtype,
                name=name,
            )
        return nn.Conv(
            features,
            kernel_size,
            strides=strides,
            padding=padding,
            name=name,
            dtype=dtype,
            param_dtype=jnp.float32,
        )

    return make


def calibrate_variables(
    variables, images: Array, config, batch_size: int | None = None
):
    """Record activation scales by running the float forward on `images`.

    Args:
      variables: model variables (params + batch_stats [+ stale quant]).
      images: [N, H, W, 3] molded calibration images (any N ≥ 1).
      config: a DetectorConfig with ``quantized_inference=True``.
      batch_size: process `images` in chunks of this size (default: all).

    Returns:
      variables with a populated ``quant`` collection. Scales accumulate via
      running max, so calling repeatedly with more data only widens ranges.
    """
    from objectdetection_tpu import detector

    model = detector.build_model(config)
    b = batch_size or images.shape[0]

    @jax.jit
    def step(variables, chunk):
        _, mutated = model.apply(
            variables, chunk, method=model.extract, mutable=["quant"]
        )
        return mutated["quant"]

    variables = dict(variables)
    for i in range(0, images.shape[0], b):
        chunk = images[i : i + b]
        if chunk.shape[0] != b:  # pad the ragged tail to keep shapes static
            pad = b - chunk.shape[0]
            chunk = jnp.concatenate([chunk, chunk[:pad]], axis=0)
        variables["quant"] = step(variables, chunk)
    return variables
