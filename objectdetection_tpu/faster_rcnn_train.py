"""Faster R-CNN training: targets, losses, optimizer step.

The reference's Faster R-CNN was never trainable — its driver is fully
commented out (`FasterRCNN/building_blocks/main.py:1-31`) and it has no loss
or optimizer code at all. This module completes the family with the same
TPU-native machinery as the Mask R-CNN path: on-device target assignment
(reusing `layers.targets` with the ZF +1 delta encoding), masked losses, and
a jitted optax step.

Coordinate frame: this family keeps the reference's pixel ``(x1, y1, x2, y2)``
convention throughout (IoU and sampling are axis-order agnostic).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import Array

from objectdetection_tpu import losses as losses_lib
from objectdetection_tpu.config import FasterRCNNConfig
from objectdetection_tpu.layers.targets import detection_targets, rpn_targets
from objectdetection_tpu.models.faster_rcnn import (
    FasterRCNN,
    encode_zf_deltas,
    zf_grid_anchors,
    zf_proposal_layer,
)


class FasterRCNNBatch(NamedTuple):
    images: Array  # [B, H, W, 3] float32 (raw or mean-subtracted)
    gt_boxes: Array  # [B, G, 4] pixel xyxy, zero-padded
    gt_class_ids: Array  # [B, G] int32, 0 = padding


def compute_losses(
    variables,
    batch: FasterRCNNBatch,
    config: FasterRCNNConfig,
    rng: Array,
) -> Dict[str, Array]:
    model = FasterRCNN(config=config)
    b = batch.images.shape[0]

    feats, rpn_logits, fg_probs, rpn_deltas = model.apply(
        variables, batch.images, method=model.features_and_rpn
    )
    h, w = feats.shape[1:3]
    anchors = jnp.asarray(zf_grid_anchors((h, w), config.backbone_stride))
    a = anchors.shape[0]

    # --- RPN targets (ZF +1 encoding) ---
    rng_rpn, rng_det = jax.random.split(rng)
    rpn_keys = jax.random.split(rng_rpn, b)
    rpn_tgt = jax.vmap(
        lambda gtb, gtv, key: rpn_targets(
            anchors, gtb, gtv, config, key, encode_fn=encode_zf_deltas
        )
    )(batch.gt_boxes, batch.gt_class_ids > 0, rpn_keys)

    # --- proposals + second-stage targets ---
    proposals, _ = zf_proposal_layer(fg_probs, rpn_deltas, config, training=True)
    proposals = jax.lax.stop_gradient(proposals)
    rng_det, rng_dropout = jax.random.split(rng_det)
    det_keys = jax.random.split(rng_det, b)
    det_tgt = jax.vmap(
        lambda p, gb, gc, key: detection_targets(
            p, gb, gc, config, key, encode_fn=encode_zf_deltas
        )
    )(proposals, batch.gt_boxes, batch.gt_class_ids, det_keys)

    logits, _, bbox = model.apply(
        variables, feats, det_tgt.rois, deterministic=False,
        method=model.classify, rngs={"dropout": rng_dropout},
    )

    active = jnp.ones((b, config.num_classes), jnp.int32)
    return {
        "rpn_class_loss": losses_lib.rpn_class_loss(
            rpn_tgt.target_class, rpn_logits.reshape(b, a, 2)
        ),
        "rpn_box_loss": losses_lib.rpn_box_loss(
            rpn_tgt.target_deltas,
            rpn_deltas.reshape(b, a, 4),
            rpn_tgt.target_class,
        ),
        "rcnn_class_loss": losses_lib.mrcnn_class_loss(
            det_tgt.target_class_ids, logits, active
        ),
        "rcnn_box_loss": losses_lib.mrcnn_box_loss(
            det_tgt.target_deltas, bbox, det_tgt.target_class_ids
        ),
    }


def make_optimizer(config: FasterRCNNConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(config.gradient_clip_norm),
        optax.add_decayed_weights(config.weight_decay),
        optax.sgd(config.learning_rate, momentum=config.learning_rate_momentum),
    )


class TrainState(NamedTuple):
    params: dict
    opt_state: dict
    step: Array


def create_train_state(config: FasterRCNNConfig, rng: Array) -> TrainState:
    model = FasterRCNN(config=config)
    h, w, c = config.image_shape
    variables = jax.jit(model.init)(rng, jnp.zeros((1, h, w, c)))
    params = variables["params"]
    return TrainState(
        params=params,
        opt_state=make_optimizer(config).init(params),
        step=jnp.zeros((), jnp.int32),
    )


def train_step(
    state: TrainState, batch: FasterRCNNBatch, rng: Array, config: FasterRCNNConfig
) -> Tuple[TrainState, Dict[str, Array]]:
    tx = make_optimizer(config)

    def loss_fn(params):
        parts = compute_losses({"params": params}, batch, config, rng)
        return sum(parts.values()), parts

    (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = dict(parts)
    metrics["total_loss"] = loss
    return TrainState(params, opt_state, state.step + 1), metrics


def make_train_step(config: FasterRCNNConfig):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, rng):
        return train_step(state, batch, rng, config)

    return step
