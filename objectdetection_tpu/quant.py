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


def _dot_lowering_wins(cin: int, cout: int) -> bool:
    """Should a 1x1 stride-1 int8 conv lower as a reshaped dot_general?

    Measured on v5e (benchmarks/one_by_one_probe.py, b96/b48, requant
    epilogue included; ms conv-HLO vs reshaped-dot):
      64²x256->1024   1.45 vs 0.68   dot wins (every EXPANDING shape did)
      256²x64->256    1.38 vs 1.21   dot wins
      32²x2048->512   0.52 vs 0.35   dot wins
      256²x256->64    1.35 vs 0.74   dot wins
      64²x1024->256   0.80 vs 1.01   conv wins
      128²x512->128   1.13 vs 1.61   conv wins
    Measured-win shapes only (no extrapolation: 4x contractions from
    1024/512-ch inputs LOSE as dots, so the pattern is not a clean rule).
    """
    return (cin, cout) in (
        (256, 1024),  # stage4 expand, 23 blocks — the big one
        (64, 256),    # stage2 expand + projection shortcut
        (256, 64),    # stage2 reduce
        (2048, 512),  # stage5 reduce
    )


def int8_conv(
    x8: Array, k8: Array, strides, padding, dot_lowering: bool = False
) -> Array:
    """The int8 conv, backend-dispatched.

    On TPU: int8×int8 → int32 on the MXU (the whole point of the PTQ
    path). On CPU (tests, CI): XLA:CPU has no vectorized int8 conv and
    falls back to scalar loops — measured 187× slower than f32 (12 s vs
    0.064 s for one 64²×256×256 3×3 conv; this single op made the test
    suite's int8 e2e fixtures take 175 s per forward). Run the identical
    integer values through the f32 pipeline instead: exact whenever a
    per-output accumulation stays below 2^24 (always true for the unit
    tests' small convs), and within f32-mantissa rounding of the int32
    result beyond that — the e2e assertions are detection-level and
    tolerance-based.

    Two consequences of this dual path (ADVICE r2):
    - **Goldens are NOT transferable across backends** past the 2^24
      accumulation bound (a 3×3 conv over 256 int8 channels can exceed it):
      CPU-generated int8 fixtures (tests/golden/e2e_small.npz) pin the CPU
      simulation, not the TPU int32 result. `test_golden_regression --regen`
      must be run on the same backend the test runs on (CI = CPU).
    - Dispatch keys on `jax.default_backend()` at TRACE time; tracing for a
      non-default backend (e.g. `jax.jit(..., device=...)` onto CPU while
      TPU is default) picks the wrong branch. All in-repo callers trace for
      the default backend; use `jax.lax.platform_dependent` here if that
      ever changes.
    """
    kh, kw, cin, cout = k8.shape
    if (
        dot_lowering
        and kh == 1
        and kw == 1
        and tuple(strides) == (1, 1)
        and (
            padding in ("SAME", "VALID")
            or all(p == (0, 0) for p in padding)
        )
        and _dot_lowering_wins(cin, cout)
    ):
        # 1x1 stride-1 conv == matmul over flattened pixels; the dot
        # lowering is up to 2x faster than the conv HLO on v5e for the
        # shapes in _dot_lowering_wins (same int8 MXU numerics — both are
        # exact int32 accumulations).
        y = int8_dot(x8.reshape(-1, cin), k8.reshape(cin, cout))
        return y.reshape(*x8.shape[:-1], cout)
    if jax.default_backend() == "tpu":
        return jax.lax.conv_general_dilated(
            x8, k8, window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
    return jax.lax.conv_general_dilated(
        x8.astype(jnp.float32), k8.astype(jnp.float32),
        window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def int8_dot(x8: Array, k8: Array) -> Array:
    """Contraction of x8's last axis with k8's first: int8 MXU path on TPU,
    f32 on CPU (see int8_conv for why)."""
    if jax.default_backend() == "tpu":
        return jax.lax.dot_general(
            x8, k8, (((x8.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    return jax.lax.dot_general(
        x8.astype(jnp.float32), k8.astype(jnp.float32),
        (((x8.ndim - 1,), (0,)), ((), ())),
    )


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
    # 2x2-blocked (space-to-depth) basis: inputs/outputs are [..., 4C]
    # blocked tensors; params keep canonical shapes and are transformed at
    # apply time (ops/s2d.py). Stride must be 1. Narrow-channel stages run
    # ~3x faster in this basis on v5e (lane-padding avoidance).
    s2d: bool = False
    # Per-INPUT-channel activation quantization: act_scale becomes a [Cin]
    # vector (per-channel absmax) and its dequant folds into the kernel —
    # k_eff[..., i, o] = k[..., i, o] * act_scale[i] / 127, quantized
    # per-output-channel as usual — so the int8 conv itself is unchanged
    # and the per-channel precision is free at serving. ResNet residual
    # streams have strongly heterogeneous channel ranges; per-tensor int8
    # of the carried stream was the dominant PTQ accuracy cost (measured:
    # float-head ablations recover ~nothing, see benchmarks/int8_accuracy).
    per_channel: bool = False
    # lower measured-win 1x1 shapes as reshaped dots (config.int8_dot_lowering)
    dot_lowering: bool = False
    # Serve in bf16 with the DEQUANTIZED int8 kernel (config.bf16_stages /
    # the Stage1Conv int8_stem pattern): same quantized weights — frozen
    # and unfrozen paths agree because the kernel round-trips through int8
    # either way — but float activations and a float conv output. Skips
    # the act-quantize pass and the int32->requant elementwise pass that
    # does not fuse into conv epilogues on this backend
    # (benchmarks/backbone_audit.py microprobes). Calibration identical.
    int8_compute: bool = True

    @nn.compact
    def __call__(
        self,
        x: Array,
        in_scale: Array | None = None,
        return_x8: bool = False,
    ) -> Array:
        """Apply the conv.

        Args:
          x: float activations — or, when `in_scale` is given on the int8
            inference path, an int8 tensor already quantized with that scale
            (the int8-carried residual stream of the ResNet stages; avoids a
            separate requantize kernel and a bf16 materialization).
          in_scale: activation scale of a pre-quantized int8 `x`.
          return_x8: on the int8 inference path, also return the quantized
            input as ``(y, (x8, scale))`` so other consumers of the same
            tensor (e.g. the ROIAlign kernel reading the P-levels the RPN
            already quantized — config.int8_align_inputs) can share it
            instead of re-reading the bf16 original. Inference-only: the
            calibration path has no int8 input to share.
        """
        kh, kw = self.kernel_size
        cin = x.shape[-1] // 4 if self.s2d else x.shape[-1]
        if self.s2d:
            assert self.strides == (1, 1) and kh in (1, 3)
            assert not self.per_channel, "per-channel + s2d not supported"
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features),
            jnp.float32,
        )
        # per-channel weight scale, populated by quant.freeze_weights (the
        # kernel param is then int8). Lives in the quant collection so the
        # params tree keeps the exact nn.Conv layout for checkpoint loaders.
        kernel_scale = self.variable(
            "quant",
            "kernel_scale",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        # running absmax of the conv input, recorded during calibration
        # (per input channel with per_channel, one scalar otherwise)
        act_shape = (cin,) if self.per_channel else ()
        act_scale = self.variable(
            "quant", "act_scale", lambda: jnp.zeros(act_shape, jnp.float32)
        )

        padding = self.padding
        if not isinstance(padding, str):
            padding = tuple(tuple(p) for p in padding)

        if self.s2d:
            from objectdetection_tpu.ops.s2d import (
                blocked_1x1_kernel,
                blocked_3x3_kernel,
            )

            xk = blocked_1x1_kernel if kh == 1 else blocked_3x3_kernel
            xc = lambda v: jnp.tile(v, 4)  # per-out-channel vectors
        else:
            xk = xc = lambda v: v

        x8_out = None  # (x8, scale) when return_x8 on the int8 path
        if self.is_mutable_collection("quant"):
            # --- calibration: exact float forward + absmax recording ---
            assert not return_x8, "return_x8 is inference-only"
            assert kernel.dtype != jnp.int8, (
                "calibrate before quant.freeze_weights, not after"
            )
            absx = jnp.abs(x.astype(jnp.float32))
            if self.per_channel:
                upd = jnp.max(absx, axis=tuple(range(x.ndim - 1)))
            else:
                upd = jnp.max(absx)
            act_scale.value = jnp.maximum(act_scale.value, upd)
            if (
                self.is_mutable_collection("stats")
                and not self.is_initializing()  # init mutates EVERY
                # collection — sowing there would leak a zero-valued
                # "stats" collection into init_variables' tree layout
                and not self.s2d
            ):
                # per-input-channel mean of the conv input, consumed by
                # apply_bias_correction (opt-in pass; the quant tree layout
                # is unchanged when "stats" isn't mutable)
                self.sow(
                    "stats",
                    "act_mean",
                    jnp.mean(
                        x.astype(jnp.float32),
                        axis=tuple(range(x.ndim - 1)),
                    ),
                )
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                xk(kernel).astype(self.dtype),
                window_strides=self.strides,
                padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        elif not self.int8_compute:
            # --- bf16 inference with the dequantized int8 kernel ---
            assert not self.s2d and not return_x8
            if kernel.dtype == jnp.int8:  # frozen offline
                k8, sw = kernel, kernel_scale.value
            else:
                k_eff = kernel
                if self.per_channel:
                    # freeze_weights folds the [Cin] act dequant into the
                    # kernel before quantization; reproduce that fold so
                    # frozen/unfrozen kernels agree bit-for-bit
                    k_eff = kernel * (act_scale.value / ACT_QMAX).reshape(
                        1, 1, cin, 1
                    )
                k8, sw = weight_qparams(k_eff)
            k = k8.astype(jnp.float32) * sw
            if self.per_channel:
                # invert the act fold: bf16 compute takes UNQUANTIZED x.
                # act_scale[c] == 0 means the input channel was identically
                # zero in calibration (its folded kernel column is zero
                # regardless), so the 0-fill is exact.
                act = act_scale.value
                k = k * jnp.where(
                    act > 0, ACT_QMAX / jnp.maximum(act, 1e-30), 0.0
                ).reshape(1, 1, cin, 1)
            xf = (
                dequantize_act(x, in_scale, self.dtype)
                if in_scale is not None
                else x
            )
            y = jax.lax.conv_general_dilated(
                xf.astype(self.dtype),
                k.astype(self.dtype),
                window_strides=self.strides,
                padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            # --- int8 inference ---
            if self.per_channel:
                # the [Cin] dequant cannot factor out of the conv sum; it
                # folds into the kernel BEFORE weight quantization instead
                # (freeze_weights does the same fold offline). The producer
                # of a carried int8 input quantized it with its out_scale
                # vector, which records the identical per-channel absmax as
                # this conv's act_scale (same tensor, same calibration), so
                # the two paths agree.
                scale_in = (
                    in_scale if in_scale is not None else act_scale.value
                )
                x8 = x if in_scale is not None else quantize_act(
                    x, act_scale.value
                )
                if kernel.dtype == jnp.int8:  # frozen offline (pre-folded)
                    k8, sw = kernel, kernel_scale.value
                else:
                    k_eff = kernel * (scale_in / ACT_QMAX).reshape(
                        1, 1, cin, 1
                    )
                    k8, sw = weight_qparams(k_eff)
                post = xc(sw)
                x8_out = (x8, scale_in)
            else:
                if in_scale is not None:
                    sx = in_scale / ACT_QMAX
                    x8 = x  # already int8 on the carried residual stream
                    x8_out = (x8, in_scale)
                else:
                    sx = act_scale.value / ACT_QMAX
                    x8 = quantize_act(x, act_scale.value)
                    x8_out = (x8, act_scale.value)
                if kernel.dtype == jnp.int8:  # frozen offline
                    k8, sw = kernel, kernel_scale.value
                else:
                    k8, sw = weight_qparams(kernel)
                post = sx * xc(sw)
            y32 = int8_conv(
                x8, xk(k8), self.strides, padding,
                dot_lowering=self.dot_lowering,
            )
            y = y32.astype(jnp.float32) * post
            y = y.astype(self.dtype)
        if bias is not None:
            y = y + xc(bias).astype(self.dtype)
        if return_x8:
            return y, x8_out
        return y


class QuantDense(nn.Module):
    """Drop-in dense layer with an int8 inference path (mirrors QuantConv).

    Parameter names/layouts ("kernel" [in, out], "bias" [out]) match
    ``flax.linen.Dense``. Used for the box head's FC-as-matmul layers
    (reference maskrcnn.py:242-294) under ``quantized_inference``.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    # per-input-channel activation quantization (see QuantConv.per_channel):
    # the [Cin] dequant folds into the kernel before weight quantization
    per_channel: bool = False

    @nn.compact
    def __call__(self, x: Array, in_scale: Array | None = None) -> Array:
        """Apply the dense layer.

        `in_scale`: activation scale of a pre-quantized int8 `x` (the
        int8-pooled ROI stream from the Pallas align kernel — same contract
        as QuantConv.in_scale: the producer quantized with scales recording
        the identical absmax as this layer's act_scale).
        """
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (cin, self.features),
            jnp.float32,
        )
        kernel_scale = self.variable(
            "quant",
            "kernel_scale",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        act_shape = (cin,) if self.per_channel else ()
        act_scale = self.variable(
            "quant", "act_scale", lambda: jnp.zeros(act_shape, jnp.float32)
        )

        if self.is_mutable_collection("quant"):
            assert kernel.dtype != jnp.int8, (
                "calibrate before quant.freeze_weights, not after"
            )
            absx = jnp.abs(x.astype(jnp.float32))
            if self.per_channel:
                upd = jnp.max(absx, axis=tuple(range(x.ndim - 1)))
            else:
                upd = jnp.max(absx)
            act_scale.value = jnp.maximum(act_scale.value, upd)
            if self.is_mutable_collection("stats") and not (
                self.is_initializing()
            ):
                self.sow(
                    "stats",
                    "act_mean",
                    jnp.mean(
                        x.astype(jnp.float32),
                        axis=tuple(range(x.ndim - 1)),
                    ),
                )
            y = jnp.matmul(x.astype(self.dtype), kernel.astype(self.dtype))
        else:
            if self.per_channel:
                scale_in = (
                    in_scale if in_scale is not None else act_scale.value
                )
                x8 = x if in_scale is not None else quantize_act(
                    x, act_scale.value
                )
                if kernel.dtype == jnp.int8:  # frozen offline (pre-folded)
                    k8, sw = kernel, kernel_scale.value
                else:
                    k_eff = kernel * (scale_in / ACT_QMAX)[:, None]
                    k8, sw = weight_qparams(k_eff)
                post = sw
            else:
                if in_scale is not None:
                    sx = in_scale / ACT_QMAX
                    x8 = x  # already int8
                else:
                    sx = act_scale.value / ACT_QMAX
                    x8 = quantize_act(x, act_scale.value)
                if kernel.dtype == jnp.int8:  # frozen offline
                    k8, sw = kernel, kernel_scale.value
                else:
                    k8, sw = weight_qparams(kernel)
                post = sx * sw
            y32 = int8_dot(x8, k8)
            y = (y32.astype(jnp.float32) * post).astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


def dense_factory(quantized: bool, dtype: Any):
    """`(features, name) -> Module`: ``nn.Dense`` or :class:`QuantDense`."""

    def make(features, name=None, per_channel=False):
        if quantized:
            return QuantDense(
                features=features, dtype=dtype, per_channel=per_channel,
                name=name,
            )
        return nn.Dense(
            features, name=name, dtype=dtype, param_dtype=jnp.float32
        )

    return make


class S2DConv(nn.Module):
    """Float conv in the 2x2-blocked basis with canonical param shapes.

    Params match ``nn.Conv`` ([kh, kw, Ci, Co] kernel, [Co] bias) so
    checkpoints are layout-independent; inputs/outputs are blocked
    [..., 4C] tensors. Stride-1 only. See ops/s2d.py.
    """

    features: int
    kernel_size: Tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from objectdetection_tpu.ops.s2d import (
            blocked_1x1_kernel,
            blocked_3x3_kernel,
        )

        kh, kw = self.kernel_size
        cin = x.shape[-1] // 4
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        xk = blocked_1x1_kernel if kh == 1 else blocked_3x3_kernel
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            xk(kernel).astype(self.dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + jnp.tile(bias, 4).astype(self.dtype)


def conv_factory(quantized: bool, dtype: Any, dot_lowering: bool = False):
    """Returns a `(features, kernel, strides, padding, name) -> Module`
    constructor: ``nn.Conv`` normally, :class:`QuantConv` when quantized,
    and the blocked-basis variants with ``s2d=True``.
    """

    def make(
        features, kernel_size, strides=(1, 1), padding="SAME", name=None,
        s2d=False, per_channel=False, int8_compute=True,
    ):
        if quantized:
            return QuantConv(
                features=features,
                kernel_size=kernel_size,
                strides=strides,
                padding=padding,
                dtype=dtype,
                s2d=s2d,
                per_channel=per_channel and not s2d,
                dot_lowering=dot_lowering,
                int8_compute=int8_compute,
                name=name,
            )
        if s2d:
            assert strides == (1, 1)
            return S2DConv(
                features=features, kernel_size=kernel_size, dtype=dtype,
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


def freeze_weights(variables):
    """Pre-quantize every QuantConv kernel to int8, offline.

    QuantConv quantizes weights from the float params at apply time, which
    is correct but — inside a serving loop or a loop-in-jit benchmark — the
    absmax/round/clip over every kernel re-runs per call (XLA does not hoist
    it) and serializes between convs. Freezing moves that work off the hot
    path: the "kernel" param becomes its int8 values and the sibling
    "kernel_scale" param (ones until now) receives the per-channel scale.

    Call AFTER :func:`calibrate_variables`. Idempotent. The float path and
    further calibration are unavailable on frozen variables.

    Note: results agree with runtime (in-jit) weight quantization up to
    ULP-level rounding — XLA may rewrite ``k / s`` as ``k * (1/s)`` inside a
    fused program, which can flip a weight sitting exactly on a rounding
    boundary by one int8 step. Detection outputs agree at the >99.9% level;
    bit-exactness holds only for weights off the .5 rounding boundary.
    """

    def walk(pnode, qnode):
        if not (isinstance(pnode, dict) and isinstance(qnode, dict)):
            return pnode, qnode
        if "kernel_scale" in qnode and "kernel" in pnode:
            k = pnode["kernel"]
            if k.dtype == jnp.int8:  # already frozen
                return pnode, qnode
            act = qnode.get("act_scale")
            if act is not None and act.ndim == 1:
                # per-channel activation layer (QuantConv/QuantDense
                # .per_channel): the [Cin] input dequant folds into the
                # kernel before weight quantization — the serving path then
                # multiplies by the per-output-channel kernel_scale alone.
                fold = act.astype(jnp.float32) / ACT_QMAX
                if k.ndim == 4:  # HWIO conv kernel
                    k = k * fold.reshape(1, 1, -1, 1)
                else:  # [in, out] dense kernel
                    k = k * fold[:, None]
            k8, sw = weight_qparams(k)
            pn = dict(pnode)
            qn = dict(qnode)
            pn["kernel"] = k8
            qn["kernel_scale"] = sw.astype(jnp.float32)
            return pn, qn
        pn = dict(pnode)
        qn = dict(qnode)
        for key, qv in qnode.items():
            if key in pn:
                pn[key], qn[key] = walk(pn[key], qv)
        return pn, qn

    out = dict(variables)
    out["params"], out["quant"] = walk(
        dict(variables["params"]), dict(variables["quant"])
    )
    return out


def calibrate_variables(
    variables,
    images: Array,
    config,
    batch_size: int | None = None,
    percentile: float | None = None,
):
    """Record activation scales by running the float forward on `images`.

    With `percentile` (e.g. 90), each calibration chunk records its own
    absmax and the final scale per tensor is that percentile of the
    per-chunk absmaxes — robust to single-activation outliers that would
    otherwise dictate the whole range (requires >= 2 chunks, i.e.
    batch_size < len(images)).

    Runs the full pipeline (extract → proposals → box head → mask head) so
    every QuantConv/QuantDense — backbone, FPN, RPN, and both ROI heads —
    observes realistic activations. The mask head is calibrated on the
    top-scoring proposals rather than final detections: both crop the same
    pyramid, and 1000 proposals cover strictly more area than ≤100
    detections, so the recorded absmax is conservative.

    Args:
      variables: model variables (params + batch_stats [+ stale quant]).
      images: [N, H, W, 3] molded calibration images (any N ≥ 1).
      config: a DetectorConfig with ``quantized_inference=True``.
      batch_size: process `images` in chunks of this size (default: all).

    Returns:
      variables with a populated ``quant`` collection. Scales accumulate via
      running max, so calling repeatedly with more data only widens ranges.
    """
    import jax.numpy as _jnp

    from objectdetection_tpu import detector
    from objectdetection_tpu.anchors import config_anchors
    from objectdetection_tpu.layers.proposals import proposal_layer

    model = detector.build_model(config)
    anchors = _jnp.asarray(config_anchors(config))
    b = batch_size or images.shape[0]

    @jax.jit
    def step(variables, chunk):
        (feats, _, probs, deltas), m = model.apply(
            variables, chunk, method=model.extract, mutable=["quant"]
        )
        v = {**variables, "quant": m["quant"]}
        props = proposal_layer(probs, deltas, anchors, config, training=False)
        _, m = model.apply(
            v, feats, props, method=model.classify_rois, mutable=["quant"]
        )
        v = {**v, "quant": m["quant"]}
        _, m = model.apply(
            v,
            feats,
            props[:, : config.detection_post_nms_instances],
            method=model.predict_masks,
            mutable=["quant"],
        )
        return m["quant"]

    variables = dict(variables)
    if percentile is None:
        for i in range(0, images.shape[0], b):
            chunk = images[i : i + b]
            if chunk.shape[0] != b:  # pad the ragged tail, shapes stay static
                pad = b - chunk.shape[0]
                chunk = jnp.concatenate([chunk, chunk[:pad]], axis=0)
            variables["quant"] = step(variables, chunk)
        return variables

    # robust calibration: each chunk records its OWN absmax (scales reset to
    # zero per chunk), then take the given percentile of the per-chunk
    # absmaxes per scale. A single outlier activation no longer dictates
    # the whole tensor's quantization range the way a running max does.
    # Reset only the activation scales (scalar, or [C] with per-channel
    # acts); kernel_scale vectors (ones until freeze_weights) must pass
    # through untouched — identified by key, not by rank.
    def zero_acts(node):
        if not isinstance(node, dict):
            return node
        return {
            k: (
                zero_acts(v)
                if isinstance(v, dict)
                else (v if k == "kernel_scale" else jnp.zeros_like(v))
            )
            for k, v in node.items()
        }

    zero_quant = zero_acts(variables["quant"])
    per_chunk = []
    for i in range(0, images.shape[0], b):
        chunk = images[i : i + b]
        if chunk.shape[0] != b:
            pad = b - chunk.shape[0]
            chunk = jnp.concatenate([chunk, chunk[:pad]], axis=0)
        per_chunk.append(step({**variables, "quant": zero_quant}, chunk))
    if len(per_chunk) < 2:
        variables["quant"] = per_chunk[0]
        return variables
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_chunk)
    variables["quant"] = jax.tree.map(
        lambda s: jnp.percentile(s.astype(jnp.float32), percentile, axis=0),
        stacked,
    )
    return variables


def record_act_means(variables, images: Array, config, batch_size=None):
    """Per-conv-input channel means on the float forward, for
    :func:`apply_bias_correction`.

    Runs the same pipeline as :func:`calibrate_variables` with the "stats"
    collection mutable, so every QuantConv/QuantDense sows the mean of its
    input over batch/space. Returns the averaged stats tree (module paths
    mirror the params tree). The quant collection is NOT modified — call
    after calibration, on the still-float variables.
    """
    from objectdetection_tpu import detector
    from objectdetection_tpu.anchors import config_anchors
    from objectdetection_tpu.layers.proposals import proposal_layer

    model = detector.build_model(config)
    anchors = jnp.asarray(config_anchors(config))
    b = batch_size or images.shape[0]
    # a stale stats collection (e.g. from a checkpoint that captured one)
    # would make sow APPEND to its tuples instead of starting fresh
    variables = {k: v for k, v in variables.items() if k != "stats"}

    @jax.jit
    def step(variables, chunk):
        mut = ["quant", "stats"]
        (feats, _, probs, deltas), m = model.apply(
            variables, chunk, method=model.extract, mutable=mut
        )
        stats = [m.get("stats", {})]
        v = {**variables, "quant": m["quant"]}
        props = proposal_layer(probs, deltas, anchors, config, training=False)
        _, m = model.apply(
            v, feats, props, method=model.classify_rois, mutable=mut
        )
        stats.append(m.get("stats", {}))
        v = {**v, "quant": m["quant"]}
        _, m = model.apply(
            v,
            feats,
            props[:, : config.detection_post_nms_instances],
            method=model.predict_masks,
            mutable=mut,
        )
        stats.append(m.get("stats", {}))
        merged = {}
        for s in stats:
            merged.update(dict(s))
        return merged

    chunks = []
    for i in range(0, images.shape[0], b):
        chunk = images[i : i + b]
        if chunk.shape[0] != b:
            pad = b - chunk.shape[0]
            chunk = jnp.concatenate([chunk, chunk[:pad]], axis=0)
        chunks.append(step(variables, chunk))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *chunks)
    # sow stores a (value,) tuple per module; chunks have equal size so the
    # mean of chunk means is the global mean
    return jax.tree.map(lambda s: jnp.mean(s, axis=0), stacked)


def apply_bias_correction(frozen, calibrated, means):
    """Fold the expected weight-quantization error into the biases.

    PTQ bias correction (Nagel et al., "Data-Free Quantization", 2019): the
    int8 serving path realizes an effective kernel r = k8 * sw (per-tensor)
    or r = k8 * sw with the [Cin] act-scale fold (per-channel) that differs
    from the calibrated float kernel by a rounding/clipping residual
    Δ = k_eff − r. Its expected output offset E[Δ·x] = Δ·E[x] is a constant
    per output channel — subtracting it from the conv bias removes the
    systematic part of the weight-quantization error at zero serving cost.

    Args:
      frozen: variables AFTER :func:`freeze_weights` (int8 kernels).
      calibrated: the same variables BEFORE freezing (float kernels,
        populated act scales).
      means: stats tree from :func:`record_act_means`.

    Returns: `frozen` with corrected biases.
    """

    def walk(fnode, cnode, qnode, mnode):
        if not isinstance(fnode, dict):
            return fnode
        if (
            "kernel_scale" in qnode
            and "kernel" in fnode
            and isinstance(mnode, dict)
            and "act_mean" in mnode
        ):
            k8 = fnode["kernel"]
            if k8.dtype != jnp.int8 or "bias" not in fnode:
                return fnode
            kf = cnode["kernel"].astype(jnp.float32)
            sw = qnode["kernel_scale"].astype(jnp.float32)
            act = qnode["act_scale"].astype(jnp.float32)
            mean = mnode["act_mean"]
            # sow stores (value,); take the latest if a stale entry leaked in
            mean = mean[-1] if isinstance(mean, tuple) else mean
            mean = mean.astype(jnp.float32)
            if act.ndim == 1:  # per-channel: fold act into kernel, mean->x8
                fold = act / ACT_QMAX
                if kf.ndim == 4:
                    k_eff = kf * fold.reshape(1, 1, -1, 1)
                else:
                    k_eff = kf * fold[:, None]
                m_in = mean * jnp.where(act > 0, ACT_QMAX / act, 0.0)
            else:  # per-tensor: r = k8*sw approximates k directly
                k_eff = kf
                m_in = mean
            r = k8.astype(jnp.float32) * sw
            delta = k_eff - r  # [*, Cin, Cout]
            corr = jnp.tensordot(
                m_in, delta.reshape(-1, mean.shape[0], delta.shape[-1])
                .sum(axis=0), axes=1,
            )
            out = dict(fnode)
            out["bias"] = fnode["bias"] + corr.astype(fnode["bias"].dtype)
            return out
        out = dict(fnode)
        for key, fv in fnode.items():
            if isinstance(fv, dict) and key in qnode:
                out[key] = walk(
                    fv,
                    cnode.get(key, {}),
                    qnode.get(key, {}),
                    mnode.get(key, {}) if isinstance(mnode, dict) else {},
                )
        return out

    out = dict(frozen)
    out["params"] = walk(
        dict(frozen["params"]),
        dict(calibrated["params"]),
        dict(frozen["quant"]),
        dict(means),
    )
    return out
