"""Frozen dataclass configs for the TPU detector stack.

Field names and default values mirror the reference configuration
(`/root/reference/MaskRCNN/config.py:5-74` and
`/root/reference/MaskRCNN/shapes.py:17-50`) so behavior is comparable, but the
implementation is a frozen dataclass: hashable (usable as a jit static arg),
immutable, and specialized by `dataclasses.replace` instead of subclass
mutation.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple


@dataclass(frozen=True)
class DetectorConfig:
    """Mask R-CNN style detector configuration (COCO defaults).

    Defaults correspond to the reference `config` class
    (`MaskRCNN/config.py:5-74`).
    """

    name: str = "coco"

    # --- image / preprocessing (config.py:9-17) ---
    image_shape: Tuple[int, int, int] = (1024, 1024, 3)
    num_classes: int = 81  # reference declares 1 but drives with 81 (inference.py:170)
    image_min_dim: int = 800
    image_max_dim: int = 1024
    image_resize_mode: str = "square"
    image_min_scale: float = 0.0
    mean_pixel: Tuple[float, float, float] = (123.7, 116.8, 103.9)
    # multiplier applied to mean-subtracted inputs inside the model; the
    # reference feeds raw mean-subtracted pixels (±130) which explodes
    # from-scratch head outputs — pretrained-parity configs keep 1.0
    input_scale: float = 1.0

    # --- backbone (config.py:20-24) ---
    backbone: str = "resnet101"
    batch_norm_decay: float = 0.9
    backbone_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    fpn_channels: int = 256

    # --- RPN / anchors (config.py:30-42) ---
    rpn_anchor_stride: int = 1
    rpn_anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    rpn_anchor_scales: Tuple[float, ...] = (32, 64, 128, 256, 512)
    rpn_nms_threshold: float = 0.7
    rpn_bbox_stddev: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)
    bbox_stddev: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)
    pre_nms_rois_count: int = 6000
    post_nms_rois_training: int = 2000
    post_nms_rois_inference: int = 1000

    # --- detection head (config.py:46-48) ---
    detection_min_threshold: float = 0.7
    detection_nms_threshold: float = 0.3
    detection_post_nms_instances: int = 100

    # --- ROI heads ---
    pool_shape: Tuple[int, int] = (7, 7)
    mask_pool_shape: Tuple[int, int] = (14, 14)
    mask_shape: Tuple[int, int] = (28, 28)

    # --- training (config.py:52-62) ---
    rpn_train_anchors_per_image: int = 256
    train_rois_per_image: int = 200
    roi_positive_ratio: float = 0.33
    use_mini_mask: bool = True
    mini_mask_shape: Tuple[int, int] = (56, 56)
    max_gt_objects: int = 100

    # --- optimizer ---
    learning_rate: float = 0.001
    learning_rate_momentum: float = 0.9
    weight_decay: float = 1e-4
    gradient_clip_norm: float = 5.0
    lr_schedule: str = "constant"  # or "warmup_cosine"
    warmup_steps: int = 100
    total_train_steps: int = 10000

    # --- numerics / execution ---
    compute_dtype: str = "bfloat16"  # backbone/head conv compute dtype
    # space-to-depth stem rewrite (identical math). Measured SLOWER than a
    # plain in-op-padded conv on v5e (the 2x2-block relayout of tiny-channel
    # data dominates) — kept as an option, off by default.
    conv1_space_to_depth: bool = False
    # rematerialize backbone blocks in backward (memory for FLOPs, training)
    remat_backbone: bool = False
    # approx_max_k for proposal pre-NMS selection. Measured on v5e
    # (benchmarks/approx_topk_recall.py): recall of the true top-1000/6000
    # and the post-NMS proposal match rate are all 1.0000 on both uniform
    # and trained-RPN-like score distributions, and the headline bench is
    # +2.4 img/s — accuracy-neutral speed, so ON by default. Set False for
    # bit-exact lax.top_k selection (reference-parity tests do). Applies to
    # INFERENCE only — the training path always uses exact top_k because
    # the accuracy evidence was measured on the inference workload.
    use_approx_topk: bool = True
    # approx_max_k's recall_target drives how many reduction stages it
    # builds; the cost cliff is steep on v5e (b96, 262k->6000: 17.3 ms at
    # 0.98, 7.0 at 0.95, 1.0 at 0.9) while the MEASURED selection quality
    # barely moves (recall of the true top-1000 at target 0.9: 0.994;
    # post-NMS proposal match stays ~1.0 — benchmarks/approx_topk_recall).
    approx_topk_recall_target: float = 0.9
    # int8 post-training-quantized inference: backbone/FPN/RPN convs run on
    # the MXU's int8 path (2x bf16 rate, half the HBM traffic). Requires
    # calibration via quant.calibrate_variables; inference only. See quant.py.
    quantized_inference: bool = False
    # Per-part int8 gates (effective only with quantized_inference): keep a
    # head in float/bf16 while the rest of the network runs int8. Changing
    # these changes the variable-tree layout (QuantConv vs nn.Conv), so
    # persisted quant artifacts are keyed to the gate settings.
    quantize_rpn: bool = True
    quantize_box_head: bool = True
    quantize_mask_head: bool = True
    # Keep the finest FPN level (the fpn_c2p2 lateral + fpn_p2 output conv)
    # in float while the rest of the network runs int8: P2 feeds most mask
    # ROIAlign samples, so this isolates/avoids the finest level's
    # quantization error at ~6% extra FPN compute (P2 is the largest map).
    quantize_fpn_p2: bool = True
    # Per-input-channel activation quantization for the backbone/FPN/RPN
    # convs and the carried residual stream: the [Cin] dequant folds into
    # each conv's int8 kernel at freeze time, so serving-path compute is
    # unchanged (quant.QuantConv.per_channel). Changes the quant-collection
    # variable shapes (act_scale/out_scale become vectors).
    per_channel_acts: bool = False
    # Run ResNet stage 2 in the 2x2-blocked (space-to-depth) basis: its
    # 64-channel convs pad to 128 lanes at full spatial resolution on v5e
    # (half the MXU + double the traffic). Identical math and identical
    # param/scale layouts; see ops/s2d.py and benchmarks/narrow_conv_probe.
    s2d_stage2: bool = False
    # Fused int8 identity bottleneck blocks (ops/fused_block.py): one Pallas
    # kernel per block — VMEM-resident intermediates, im2col 3x3 (full MXU
    # contraction even on 64-channel stage 2), fused requant epilogues.
    # Inference-only; applies when quantized_inference and weights frozen.
    fused_bottleneck: bool = False
    # Pallas patch-DMA ROIAlign on the inference path (TPU only; auto-falls
    # back to the XLA gather when unsupported — small pyramids, training,
    # non-TPU backends). "all" | "masks" | "off". The mask stage (100
    # ROIs/img) wins ~9x with the kernel; the box stage (1000 ROIs/img) wins
    # ~1.5x on realistic proposal-size mixes but is per-step-overhead-bound
    # at ~parity on degenerate (all-huge-box) inputs. See
    # ops/roi_align_pallas.py.
    pallas_roi_align: str = "all"
    # Lower 1x1 stride-1 int8 convs at measured-win shapes as reshaped
    # dot_generals (quant._dot_lowering_wins). The per-op probe
    # (benchmarks/one_by_one_probe.py) showed up to 2x wins, but END-TO-END
    # the lowering is a catastrophic loss — bench_matrix r4: dot_only
    # 594.4 ms/b96 vs r2ish 455.7 (+139 ms; the whole r3 regression) —
    # in-context XLA layout/fusion around reshape→dot→reshape inverts the
    # isolated-probe win. OFF; the gate stays so the matrix can re-measure
    # if the lowering is ever reworked.
    int8_dot_lowering: bool = False
    # Proposal-layer box decode order: True decodes ALL anchors in one
    # elementwise pass then gathers once (r3 formulation); False gathers
    # deltas+anchors for the pre-NMS top-k then decodes (r2 formulation).
    # Numerically identical either way; gate exists for end-to-end
    # measurement (benchmarks/bench_matrix.py).
    proposal_decode_all: bool = True
    # int8 pooled-ROI stream: the Pallas align kernel quantizes pooled
    # tensors in its epilogue with the consumer head's calibrated scales
    # (recorded as pooled_box_scale / pooled_mask_scale during calibration)
    # and the box/mask heads take the int8 input directly. Skips a separate
    # read-bf16/write-int8 pass over the multi-GB pooled tensors that XLA
    # cannot fuse into the opaque pallas_call. Bit-identical to the
    # unfused quantize (parity-tested); active only where the Pallas
    # kernel runs (TPU serving).
    int8_pooled: bool = True
    # int8 ROIAlign INPUTS: the Pallas align kernel reads the int8 copies
    # of P2..P5 the RPN's shared conv quantizes anyway (one shared act
    # scale; RPNHead return_quantized_inputs), instead of the bf16
    # pyramid. Halves the kernel's patch-DMA bytes — its measured bound on
    # the box stage — at zero extra quantize passes; the s_in dequant
    # folds into the kernel's epilogue map. Requires quantize_rpn; the XLA
    # fallback and calibration keep the float pyramid. Tolerance-level
    # numerics vs aligning the dequantized features (not bit-exact; TPU
    # smoke: max float err 0.031, int8 codes within one rounding step —
    # benchmarks/pallas_align_smoke.py, r4). TPU-measured END-TO-END before
    # defaulting on (bench_matrix r4): 455.6 ms/b96 (210.7 img/s) vs 463.9
    # for the same combo without it — the full-pipeline win of halving the
    # align kernel's patch-DMA bytes.
    int8_align_inputs: bool = True
    # int8 stem compute. True: conv1 runs int8 — but its int32 output
    # ([B,512²,64] = 6.4 GB/b96) plus the unfused dequant pass is ~13 GB of
    # extra HBM traffic on a conv whose compute is trivial either way
    # (cin=3 starves the MXU; audit: stem 27.6 ms vs 9.2 memory roofline).
    # False: serve conv1 in bf16 with the DEQUANTIZED int8 kernel — same
    # quantized weights (frozen artifacts load unchanged, calibration
    # identical), no act-quant error, no int32 materialization. Measured
    # end-to-end (bench_matrix r4): bf16_stem 451.2 ms/b96 (212.8 img/s)
    # vs 454.2-455.6 for the same combo with the int8 stem — default False.
    int8_stem: bool = False
    # Serve the listed ResNet stages (subset of 2..5) in bf16 with the
    # DEQUANTIZED int8 kernels on an otherwise-int8 path — the stem pattern
    # (int8_stem) generalized per stage. Rationale: the backbone audit's
    # conv microprobes show requant epilogues do NOT fuse into convs on
    # this backend (each int8 conv pays an int32->requant elementwise pass)
    # and stage 2's 64-channel tensors waste half the int8 (32,128) tile
    # lanes; bf16 serving skips the act-quantize pass and the unfused
    # requant chain at 2x the MXU cost — a measured win for the stem.
    # Same quantized weights (frozen artifacts load unchanged; per-channel
    # act folds are inverted at apply time), same calibration. Measure via
    # benchmarks/bench_matrix.py (bf16_s2 / bf16_s23 entries) before
    # changing the default.
    bf16_stages: Tuple[int, ...] = ()
    # ROIs covered per Pallas ROIAlign GRID step (0 = one K_ROIS chunk, the
    # original form). A multiple of K_ROIS (16): the kernel loops
    # step/K chunks over the same double-buffered patch store, amortizing
    # the per-step pipelined input-block copies (5 blocks, ~1.2-1.9 us/step
    # fixed — the K-sweep algebra attributes ~11.5 ms/b96 @K=16 to them).
    # Measure via benchmarks/bench_matrix.py (step128 entry) before
    # changing the default.
    align_step_rois: int = 0
    # Skip whole K-ROI chunks whose rows are ALL sentinel (zero-padding)
    # rows in the Pallas ROIAlign kernel, and the DMA-issue loop of chunks
    # with NO patch-DMA-class row (cached-top and sentinel rows never
    # issue patch DMAs — on the degenerate bench mix that is every row).
    # Sentinel rows do no DMA/compute but still pay the full per-ROI
    # predicate scaffolding (~20 scalar `pl.when` evaluations each —
    # roi_dispatch_probe); zero-padding rows are contiguous per image
    # (proposal/detection tails), so most live in all-sentinel chunks
    # guarded by ONE per-chunk flag instead.
    # Bit-identical outputs (sentinel rows are overwritten outside the
    # kernel either way). Measure via benchmarks/bench_matrix.py
    # (skip_chunks entry) before changing the default.
    # Default ON since r5: sentinel-only skipping measured neutral, but
    # gating the DMA-issue loop on the any-DMA flag measured 424.6 ms/b96
    # vs 454.2 same-process (−29.6 ms, 226.1 img/s) — the all-top issue
    # predicates were exposed scalar-core cost on the degenerate mix.
    align_skip_chunks: bool = True
    # Reproduce the reference's mrcnn box-loss bug (binary CE instead of
    # smooth-L1, loss_optimize.py:195-197) for parity testing only.
    compat_reference_box_loss: bool = False
    # Append the GT boxes to the RPN proposals before detection-target
    # sampling (training only). Guarantees positive ROIs from step 0 — at
    # random init no proposal reaches the 0.5 IoU threshold, so the box/mask
    # heads would otherwise see zero gradient until the RPN warms up. The
    # standard Detectron-style trick; the reference has no equivalent (its
    # training never reached an optimizer, SURVEY.md §0).
    train_append_gt: bool = False

    @property
    def num_anchors_per_location(self) -> int:
        return len(self.rpn_anchor_ratios)

    @property
    def fpn_levels(self) -> Tuple[int, ...]:
        """Pyramid levels carrying anchors (P2..P6)."""
        return tuple(range(2, 2 + len(self.backbone_strides)))

    @property
    def roi_levels(self) -> Tuple[int, ...]:
        """Pyramid levels used for ROIAlign (P2..P5)."""
        return (2, 3, 4, 5)

    def feature_shapes(self) -> Tuple[Tuple[int, int], ...]:
        """Pyramid feature-map shapes for the configured image size.

        ≙ reference `utils.get_resnet_stage_shapes` (utils.py:155-178).
        """
        h, w = self.image_shape[:2]
        return tuple(
            (-(-h // s), -(-w // s)) for s in self.backbone_strides
        )

    def num_anchors(self) -> int:
        k = self.num_anchors_per_location
        return sum(fh * fw * k for fh, fw in self.feature_shapes())

    def replace(self, **kw) -> "DetectorConfig":
        return dataclasses.replace(self, **kw)

    def display(self) -> str:
        lines = ["Configurations:"]
        for f in dataclasses.fields(self):
            lines.append("{:35} {}".format(f.name, getattr(self, f.name)))
        return "\n".join(lines)


# Synthetic-shapes config, ≙ reference `ShapesConfig` (MaskRCNN/shapes.py:17-50)
SHAPES_CONFIG = DetectorConfig(
    name="shapes",
    image_shape=(128, 128, 3),
    num_classes=4,  # background + square/circle/triangle
    image_min_dim=128,
    image_max_dim=128,
    backbone="resnet50",
    input_scale=1.0 / 64.0,  # trains from scratch (no pretrained backbone)
    rpn_anchor_scales=(8, 16, 32, 64, 128),
    train_rois_per_image=32,
    post_nms_rois_training=2000,
    post_nms_rois_inference=1000,
    use_mini_mask=False,
    mini_mask_shape=(0, 0),
    max_gt_objects=4,
)

COCO_CONFIG = DetectorConfig()


@dataclass(frozen=True)
class FasterRCNNConfig:
    """Faster R-CNN (VGG16) configuration.

    ≙ reference `FasterRCNN/config.py:5-19` + the proposal-layer constants at
    `FasterRCNN/building_blocks/proposals.py:378-390`.
    """

    num_classes: int = 4
    image_shape: Tuple[int, int, int] = (224, 224, 3)
    backbone_stride: int = 16
    anchor_scales: Tuple[float, ...] = (8, 16, 32)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)

    # train / test proposal budgets (proposals.py:378-387)
    pre_nms_top_n_train: int = 12000
    post_nms_top_n_train: int = 2000
    pre_nms_top_n_test: int = 6000
    post_nms_top_n_test: int = 300
    nms_threshold: float = 0.2
    min_box_size: float = 16.0

    pool_shape: Tuple[int, int] = (7, 7)

    # training (the reference never finished its Faster R-CNN driver;
    # classic paper-style defaults)
    rpn_train_anchors_per_image: int = 256
    rpn_bbox_stddev: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    bbox_stddev: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    train_rois_per_image: int = 64
    roi_positive_ratio: float = 0.25
    mask_shape: Tuple[int, int] = (14, 14)  # unused (no mask head)
    learning_rate: float = 0.001
    learning_rate_momentum: float = 0.9
    weight_decay: float = 5e-4
    gradient_clip_norm: float = 10.0

    def replace(self, **kw) -> "FasterRCNNConfig":
        return dataclasses.replace(self, **kw)
