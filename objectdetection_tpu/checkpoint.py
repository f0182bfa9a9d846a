"""Checkpointing: orbax save/restore + matterport-h5 weight ingestion.

≙ the reference `load_params.py`: it copies matterport `mask_rcnn_coco.h5`
tensors into TF variables one `sess.run` per variable (~1-2 min,
load_params.py:153, SURVEY.md §5.4). Here the h5 is converted once into a
flax variable pytree on host (milliseconds) and lands on device as one
transfer; trained-model persistence (which the reference lacked entirely —
no `tf.train.Saver`) is orbax.

Matterport h5 layout handled (load_params.py:105-135):
- ``h5[layer][layer][{kernel,bias,gamma,beta,moving_mean,moving_variance}:0]``
- RPN layers nest under a shared ``rpn_model`` group (load_params.py:106-109)
- conv kernels are HWIO (matches flax); the two head "FC-conv" layers are
  stored as 7×7/1×1 convs and reshaped into this framework's dense matmuls;
  the mask deconv kernel converts Keras' (kh, kw, out, in) to flax's
  (kh, kw, in, out).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Orbax persistence
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, state: Any) -> None:
    """Save a train state / variable pytree with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint` (structure of `like`)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, like)


def save_quantized(path: str, variables: Any, config: Any = None) -> None:
    """Persist a calibrated+frozen int8 serving artifact.

    `variables` should be the output of ``quant.freeze_weights(
    quant.calibrate_variables(...))``: int8 kernels, per-channel
    ``kernel_scale`` vectors and activation scales in the ``quant``
    collection. Loading it back skips the whole calibrate+freeze pass
    (~9 min at COCO scale on the TPU relay), which makes int8 serving
    deployable — the reference's closest analog is the pretrained-h5
    ingest (load_params.py:76-162), which also exists to avoid
    recomputing weights at startup.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, variables)
    ckptr.wait_until_finished()
    if config is not None:
        # the quantization gates change the variable-tree layout (QuantConv
        # vs nn.Conv; scalar vs [C] scales) — persist them so loaders can
        # restore a matching config instead of failing with an opaque
        # tree-mismatch error
        meta = {
            "per_channel_acts": bool(config.per_channel_acts),
            "quantize_rpn": bool(config.quantize_rpn),
            "quantize_box_head": bool(config.quantize_box_head),
            "quantize_mask_head": bool(config.quantize_mask_head),
            "quantize_fpn_p2": bool(config.quantize_fpn_p2),
            "backbone": config.backbone,
            "image_shape": list(config.image_shape),
        }
        with open(os.path.join(path, "quant_meta.json"), "w") as f:
            json.dump(meta, f, indent=1)


def load_quant_meta(path: str):
    """Gate settings persisted next to a quantized artifact (or None for
    artifacts saved before quant_meta existed)."""
    p = os.path.join(os.path.abspath(path), "quant_meta.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def load_quantized(path: str) -> Any:
    """Restore an artifact saved by :func:`save_quantized`.

    Restores with the *saved* dtypes (int8 kernels stay int8) and no
    template tree, so callers don't need to rebuild the variable structure
    first.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)


def cast_params_for_inference(variables, dtype=None):
    """Cast floating-point params to the compute dtype once.

    Inference-only optimization: flax modules cast fp32 params to bf16 on
    every call, which re-reads the full fp32 tree from HBM each batch
    (~260 MB for R101). Pre-cast weights halve that traffic. Don't train on
    the result (optimizer state should stay fp32).
    """
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, variables)


# ---------------------------------------------------------------------------
# matterport h5 → flax variables
# ---------------------------------------------------------------------------

_BN_LEAF_MAP = {
    "scale": "gamma:0",
    "bias": "beta:0",
    "mean": "moving_mean:0",
    "var": "moving_variance:0",
}
_CONV_LEAF_MAP = {"kernel": "kernel:0", "bias": "bias:0"}


def _is_bn(layer_name: str) -> bool:
    return layer_name.startswith("bn") or "_bn" in layer_name


def _h5_group(h5, layer_name: str):
    """Resolve the h5 group for a layer, honoring the rpn_model nesting."""
    if layer_name.startswith("rpn_"):
        return h5["rpn_model"][layer_name]
    return h5[layer_name][layer_name]


def load_matterport_h5(
    h5_path: str,
    variables: Any,
    skip_layers: Optional[list] = None,
    strict: bool = True,
) -> Any:
    """Fill a flax variable tree from a matterport-format h5 file.

    Args:
      h5_path: path to e.g. mask_rcnn_coco.h5.
      variables: template variable tree from `detector.init_variables` —
        values with a matching h5 entry are replaced, others kept (so
        `skip_layers` reproduces the reference's `train_nets='heads'`
        random-head behavior, load_params.py:85-103).
      skip_layers: layer names to leave at their current (random) values.
      strict: raise on shape mismatch (load_params.py:143-146); otherwise skip.

    Returns a new variable tree.
    """
    import h5py

    skip = set(skip_layers or [])
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)

    with h5py.File(h5_path, "r") as h5:
        new_leaves = []
        for path, leaf in flat:
            keys = [getattr(p, "key", str(p)) for p in path]
            layer = keys[-2]  # module name (e.g. res2a_branch2a)
            leaf_name = keys[-1]  # kernel / bias / scale / mean / var
            if layer in skip:
                new_leaves.append(leaf)
                continue
            h5_key = (
                _BN_LEAF_MAP.get(leaf_name)
                if _is_bn(layer)
                else _CONV_LEAF_MAP.get(leaf_name)
            )
            if h5_key is None:
                new_leaves.append(leaf)
                continue
            try:
                grp = _h5_group(h5, layer)
                val = np.asarray(grp[h5_key])
            except KeyError:
                if strict:
                    raise KeyError(
                        f"layer {layer!r}/{h5_key} not found in {h5_path}"
                    )
                new_leaves.append(leaf)
                continue

            val = _adapt_shape(layer, leaf_name, val, np.asarray(leaf).shape, strict)
            new_leaves.append(jnp.asarray(val, dtype=leaf.dtype))

    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _adapt_shape(layer, leaf_name, val, want_shape, strict):
    """Convert h5 tensor layouts to this framework's parameter layouts."""
    if leaf_name == "kernel":
        if layer == "mrcnn_class_conv1" and val.ndim == 4:
            # 7x7 conv [7,7,C,1024] → dense [7*7*C, 1024]
            val = val.reshape(-1, val.shape[-1])
        elif layer == "mrcnn_class_conv2" and val.ndim == 4:
            # 1x1 conv [1,1,1024,1024] → dense [1024, 1024]
            val = val.reshape(val.shape[-2], val.shape[-1])
        elif layer == "mrcnn_mask_deconv":
            # Keras Conv2DTranspose stores (kh, kw, out, in) and computes the
            # gradient-of-conv (spatially flipped) operation; flax
            # ConvTranspose correlates without the flip, so convert with BOTH
            # a channel swap and a spatial flip.
            val = np.transpose(val, (0, 1, 3, 2))[::-1, ::-1]
    if tuple(val.shape) != tuple(want_shape):
        msg = (
            f"shape mismatch for {layer}/{leaf_name}: "
            f"h5 {val.shape} vs model {want_shape}"
        )
        if strict:
            raise ValueError(msg)
        return np.zeros(want_shape, val.dtype)
    return val


# The reference's 'heads' skip-list (load_params.py:86) — layers left at
# random init when fine-tuning heads on a new dataset.
HEADS_LAYERS = [
    "fpn_c5p5", "fpn_c4p4", "fpn_c3p3", "fpn_c2p2",
    "fpn_p2", "fpn_p3", "fpn_p4", "fpn_p5",
    "rpn_conv_shared", "rpn_class_raw", "rpn_bbox_pred",
    "mrcnn_class_conv1", "mrcnn_class_bn1",
    "mrcnn_class_conv2", "mrcnn_class_bn2",
    "mrcnn_class_logits", "mrcnn_bbox_fc",
]
