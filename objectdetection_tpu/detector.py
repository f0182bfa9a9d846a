"""End-to-end detector API: jitted inference and training step.

≙ the reference drivers (`MaskRCNN/inference.py`, `training.py`) — but where
the reference runs ≥8 `sess.run` round-trips per batch with numpy/pickle
handoffs between stages (SURVEY.md §3.1), here `infer_fn` and `train_step`
are each ONE XLA program: preprocessing windows in, detections (and masks)
out, with no host boundary crossings in the middle.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array

from objectdetection_tpu import losses as losses_lib
from objectdetection_tpu.anchors import config_anchors
from objectdetection_tpu.config import DetectorConfig
from objectdetection_tpu.geometry import norm_boxes
from objectdetection_tpu.layers.detection import detection_layer
from objectdetection_tpu.layers.proposals import proposal_layer
from objectdetection_tpu.layers.targets import detection_targets, rpn_targets
from objectdetection_tpu.models.mask_rcnn import MaskRCNN


class Detections(NamedTuple):
    """Fixed-size detection results for a batch."""

    boxes: Array  # [B, N, 4] normalized (y1, x1, y2, x2)
    class_ids: Array  # [B, N] int32 (0 = empty slot)
    scores: Array  # [B, N]
    valid: Array  # [B, N] bool
    masks: Optional[Array] = None  # [B, N, 28, 28] predicted-class soft masks


def build_model(config: DetectorConfig) -> MaskRCNN:
    return MaskRCNN(config=config)


def init_variables(config: DetectorConfig, rng: Array, batch_size: int = 1):
    """Initialize the full parameter tree (params + frozen batch_stats).

    Parameters are resolution-independent (fully convolutional backbone,
    dense heads over fixed pool shapes), so init runs on the smallest legal
    canvas (64², the 2⁶-divisibility floor, fpn.py:160-163) under jit.
    """
    model = build_model(config)
    dummy = jnp.zeros((batch_size, 64, 64, config.image_shape[2]), jnp.float32)
    return jax.jit(model.init)(rng, dummy)


def forward_inference(
    variables,
    images: Array,
    windows: Array,
    config: DetectorConfig,
    with_masks: bool = True,
    return_intermediates: bool = False,
) -> Detections:
    """Full inference pipeline on molded images.

    Args:
      variables: flax variable tree from :func:`init_variables` / checkpoint.
      images: [B, H, W, 3] molded (resized + mean-subtracted) images.
      windows: [B, 4] pixel windows of real image content within the canvas.
      config: detector config (static).
      with_masks: also run the mask head on final detections.
      return_intermediates: also return a dict of stage outputs — the jit-era
        equivalent of the reference's DEBUG tensor dicts and stage pickles
        (proposals_tf.py:202-214, inference_debug.py:248-297).
    """
    model = build_model(config)
    anchors = jnp.asarray(config_anchors(config))  # trace-time constant

    # int8_align_inputs: also pull the int8 P-levels the RPN quantized so
    # the Pallas align kernel DMAs 1 B/elt patches (see config gate)
    want_q = (
        config.int8_align_inputs
        and config.quantized_inference
        and config.quantize_rpn
    )
    if want_q:
        feats, rpn_logits, rpn_probs, rpn_deltas, qfeats = model.apply(
            variables, images, True, method=model.extract
        )
    else:
        feats, rpn_logits, rpn_probs, rpn_deltas = model.apply(
            variables, images, method=model.extract
        )
        qfeats = None
    proposals = proposal_layer(rpn_probs, rpn_deltas, anchors, config, training=False)

    _, cls_probs, bbox = model.apply(
        variables, feats, proposals, True, qfeats,
        method=model.classify_rois,
    )

    norm_windows = norm_boxes(windows, config.image_shape[:2])
    det = detection_layer(proposals, cls_probs, bbox, norm_windows, config)

    masks = None
    if with_masks:
        det_boxes = det[..., :4]
        cls = det[..., 4].astype(jnp.int32)
        # class-selected fast path: [B, N, 28, 28] for each ROI's own class
        # (equivalent to full-class prediction + take_along_axis, without
        # materializing the [B, N, 28, 28, num_classes] tensor)
        masks = model.apply(
            variables, feats, det_boxes, cls, True, qfeats,
            method=model.predict_masks,
        )

    result = Detections(
        boxes=det[..., :4],
        class_ids=det[..., 4].astype(jnp.int32),
        scores=det[..., 5],
        valid=det[..., 5] > 0,
        masks=masks,
    )
    if return_intermediates:
        intermediates = {
            "pyramid": {f"p{i + 2}": f for i, f in enumerate(feats)},
            "rpn_class_logits": rpn_logits,
            "rpn_class_probs": rpn_probs,
            "rpn_bbox": rpn_deltas,
            "proposals": proposals,
            "mrcnn_class_probs": cls_probs,
            "mrcnn_bbox": bbox,
            "detections": det,
        }
        return result, intermediates
    return result


@functools.lru_cache(maxsize=16)
def make_infer_fn(config: DetectorConfig, with_masks: bool = True):
    """Returns a jitted `(variables, images, windows) -> Detections`.

    Cached per (config, with_masks): repeated calls (e.g. periodic eval
    during training) reuse the same jitted callable and its compiled
    executables instead of retracing.
    """

    @jax.jit
    def infer_fn(variables, images, windows):
        return forward_inference(variables, images, windows, config, with_masks)

    return infer_fn


# --------------------------------------------------------------------------
# Training
# --------------------------------------------------------------------------


class TrainBatch(NamedTuple):
    """One device batch of training data (all zero-padded to static shapes)."""

    images: Array  # [B, H, W, 3] molded
    gt_boxes: Array  # [B, G, 4] normalized
    gt_class_ids: Array  # [B, G] int32, 0 = padding
    gt_masks: Optional[Array] = None  # [B, G, H, W] {0,1}
    active_class_ids: Optional[Array] = None  # [B, C]


def compute_losses(
    variables,
    batch: TrainBatch,
    config: DetectorConfig,
    rng: Array,
    with_masks: bool = False,
) -> Dict[str, Array]:
    """Forward pass + target assignment + all losses (one jit-able program).

    ≙ the reference `Train.build_train_graph` (training.py:194-230) plus the
    optimizer-facing total loss the reference lacked.
    """
    model = build_model(config)
    anchors_norm = jnp.asarray(config_anchors(config))
    b = batch.images.shape[0]

    feats, rpn_logits, rpn_probs, rpn_deltas = model.apply(
        variables, batch.images, method=model.extract
    )

    # --- RPN targets (vmapped per image, fresh key each) ---
    rng_rpn, rng_det = jax.random.split(rng)
    rpn_keys = jax.random.split(rng_rpn, b)
    rpn_tgt = jax.vmap(
        lambda gtb, gtv, key: rpn_targets(anchors_norm, gtb, gtv, config, key)
    )(batch.gt_boxes, batch.gt_class_ids > 0, rpn_keys)

    # --- proposals + detection targets ---
    # Proposals are training *inputs* to the second stage, not a gradient
    # path (the reference stops gradients at ROI boxes too, maskrcnn.py:138);
    # RPN learns via its own losses. This also keeps the NMS while_loop out
    # of the backward program.
    proposals = jax.lax.stop_gradient(
        proposal_layer(rpn_probs, rpn_deltas, anchors_norm, config, training=True)
    )
    if getattr(config, "train_append_gt", False):
        # [B, P+G, 4]: zero-padded GT rows stay invalid inside
        # detection_targets (prop_valid tests |box| > 0)
        gt_rows = jnp.where(
            (batch.gt_class_ids > 0)[:, :, None], batch.gt_boxes, 0.0
        )
        proposals = jnp.concatenate([proposals, gt_rows], axis=1)
    det_keys = jax.random.split(rng_det, b)
    if with_masks and batch.gt_masks is not None:
        # gt_masks may be full-frame [B,G,H,W] or mini-masks in per-instance
        # box frames (config.use_mini_mask + mini-mask-shaped input)
        mini = (
            config.use_mini_mask
            and batch.gt_masks.shape[2:] == tuple(config.mini_mask_shape)
        )
        det_tgt = jax.vmap(
            lambda p, gb, gc, gm, key: detection_targets(
                p, gb, gc, config, key, gt_masks=gm, masks_are_mini=mini
            )
        )(proposals, batch.gt_boxes, batch.gt_class_ids, batch.gt_masks, det_keys)
    else:
        det_tgt = jax.vmap(
            lambda p, gb, gc, key: detection_targets(p, gb, gc, config, key)
        )(proposals, batch.gt_boxes, batch.gt_class_ids, det_keys)

    # --- ROI heads on sampled rois ---
    cls_logits, _, bbox = model.apply(
        variables, feats, det_tgt.rois, method=model.classify_rois
    )

    active = (
        batch.active_class_ids
        if batch.active_class_ids is not None
        else jnp.ones((b, config.num_classes), jnp.int32)
    )

    out = {
        "rpn_class_loss": losses_lib.rpn_class_loss(rpn_tgt.target_class, rpn_logits),
        "rpn_box_loss": losses_lib.rpn_box_loss(
            rpn_tgt.target_deltas, rpn_deltas, rpn_tgt.target_class
        ),
        "mrcnn_class_loss": losses_lib.mrcnn_class_loss(
            det_tgt.target_class_ids, cls_logits, active
        ),
        "mrcnn_box_loss": losses_lib.mrcnn_box_loss(
            det_tgt.target_deltas,
            bbox,
            det_tgt.target_class_ids,
            compat_reference=config.compat_reference_box_loss,
        ),
    }

    if with_masks and batch.gt_masks is not None:
        mask_probs = model.apply(
            variables, feats, det_tgt.rois, method=model.predict_masks
        )
        out["mask_loss"] = losses_lib.mask_loss(
            det_tgt.target_masks, mask_probs, det_tgt.target_class_ids
        )
    return out


def make_optimizer(
    config: DetectorConfig, train_layers: str = "all"
) -> optax.GradientTransformation:
    """SGD + momentum + weight decay + clip — the step the reference never had.

    `train_layers='heads'` freezes everything except the FPN laterals, RPN
    and ROI heads (≙ the reference's `train_nets='heads'` fine-tuning mode,
    load_params.py:85-86, via an optax mask instead of a skip-list).

    `config.lr_schedule`: "constant" or "warmup_cosine" (linear warmup over
    `config.warmup_steps` then cosine decay to zero over
    `config.total_train_steps`).
    """
    if getattr(config, "lr_schedule", "constant") == "warmup_cosine":
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=config.learning_rate,
            warmup_steps=config.warmup_steps,
            decay_steps=max(config.total_train_steps, config.warmup_steps + 1),
        )
    else:
        lr = config.learning_rate
    tx = optax.chain(
        optax.clip_by_global_norm(config.gradient_clip_norm),
        optax.add_decayed_weights(config.weight_decay),
        optax.sgd(lr, momentum=config.learning_rate_momentum),
    )
    if train_layers == "all":
        return tx

    assert train_layers == "heads", train_layers
    from objectdetection_tpu.checkpoint import HEADS_LAYERS

    head_names = set(HEADS_LAYERS) | {
        "mrcnn_mask_conv1", "mrcnn_mask_bn1", "mrcnn_mask_conv2",
        "mrcnn_mask_bn2", "mrcnn_mask_conv3", "mrcnn_mask_bn3",
        "mrcnn_mask_conv4", "mrcnn_mask_bn4", "mrcnn_mask_deconv",
        "mrcnn_mask",
    }

    def label_tree(params):
        def label(path):
            in_heads = any(getattr(p, "key", None) in head_names for p in path)
            return "train" if in_heads else "freeze"

        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        treedef = jax.tree_util.tree_structure(params)
        return jax.tree_util.tree_unflatten(treedef, [label(p) for p, _ in flat])

    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, label_tree
    )


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array


def create_train_state(
    config: DetectorConfig, rng: Array, batch_size: int = 1,
    train_layers: str = "all",
):
    variables = init_variables(config, rng, batch_size)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(config, train_layers)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def train_step(
    state: TrainState,
    batch: TrainBatch,
    rng: Array,
    config: DetectorConfig,
    with_masks: bool = False,
    train_layers: str = "all",
) -> Tuple[TrainState, Dict[str, Array]]:
    """One SGD step (jit/shard_map-able; pure function of its inputs)."""
    tx = make_optimizer(config, train_layers)

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        parts = compute_losses(variables, batch, config, rng, with_masks)
        return losses_lib.total_loss(parts), parts

    (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = dict(parts)
    metrics["total_loss"] = loss
    # per-head gradient norms: direct evidence a real gradient reaches each
    # top-level subtree (backbone/RPN/box/mask). Loss magnitudes alone are
    # weak evidence — e.g. mrcnn_box_loss is ~1e-5 at init with GT-appended
    # proposals (ADVICE r3). Costs four fused reductions inside the step.
    for head, sub in grads.items():
        metrics[f"grad_norm/{head}"] = optax.global_norm(sub)
    new_state = TrainState(
        params=params,
        batch_stats=state.batch_stats,
        opt_state=opt_state,
        step=state.step + 1,
    )
    return new_state, metrics


def make_train_step(
    config: DetectorConfig, with_masks: bool = False, train_layers: str = "all"
):
    """Returns a jitted, donated `(state, batch, rng) -> (state, metrics)`."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, rng):
        return train_step(state, batch, rng, config, with_masks, train_layers)

    return step
