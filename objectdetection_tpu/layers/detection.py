"""Detection layer: classifier outputs → final detections.

≙ the reference `DetectionLayer` (`detection.py:56-260`): per-ROI argmax
class, gather that class's box delta (scaled by BBOX_STD_DEV), refine + clip
to the image window, drop background/low scores, per-class NMS, keep the top
`detection_post_nms_instances` by score, emit
``[B, N, (y1, x1, y2, x2, class_id, score)]`` zero-padded.

The reference runs a per-image Python loop with `tf.sets`/`tf.unique`/
`tf.map_fn`-over-classes (detection.py:143-235). Here class-aware suppression
inside one tiled NMS pass replaces the per-class map, and the batch is vmapped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from objectdetection_tpu.config import DetectorConfig
from objectdetection_tpu.geometry import apply_box_deltas, clip_boxes
from objectdetection_tpu.ops.nms import non_max_suppression


def detection_layer(
    proposals: Array,
    class_probs: Array,
    bbox_deltas: Array,
    window: Array,
    config: DetectorConfig,
) -> Array:
    """Final detection postprocess.

    Args:
      proposals: [B, P, 4] normalized proposals (zero-padded).
      class_probs: [B, P, C] softmax class probabilities.
      bbox_deltas: [B, P, C, 4] per-class refinements.
      window: [B, 4] normalized (y1, x1, y2, x2) valid-image window.
      config: detector config.

    Returns:
      [B, N, 6] detections (y1, x1, y2, x2, class_id, score), zero-padded;
      N = config.detection_post_nms_instances.
    """
    n_out = config.detection_post_nms_instances
    stddev = jnp.asarray(config.bbox_stddev, jnp.float32)

    def per_image(props, probs, deltas, win):
        p = props.shape[0]
        class_ids = jnp.argmax(probs, axis=-1)  # [P]
        scores = jnp.take_along_axis(probs, class_ids[:, None], axis=1)[:, 0]
        # per-(roi, argmax-class) delta (detection.py:115-130)
        d = jnp.take_along_axis(
            deltas, class_ids[:, None, None].repeat(4, -1), axis=1
        )[:, 0, :]
        refined = apply_box_deltas(props, d * stddev)
        refined = clip_boxes(refined, win)

        # Keep rule = EXACTLY the reference's (detection.py:150-158):
        # foreground argmax class AND score above the gate. No zero-area
        # filter — the reference keeps degenerate window-edge boxes (and
        # even zero-padded proposal rows) if the head scores them; the
        # end-to-end reference golden pins this behavior.
        valid = (class_ids > 0) & (scores > config.detection_min_threshold)

        res = non_max_suppression(
            refined,
            scores,
            n_out,
            config.detection_nms_threshold,
            valid=valid,
            class_ids=class_ids,
        )
        idx = jnp.maximum(res.indices, 0)
        out = jnp.concatenate(
            [
                jnp.take(refined, idx, axis=0),
                jnp.take(class_ids, idx)[:, None].astype(jnp.float32),
                jnp.take(scores, idx)[:, None],
            ],
            axis=1,
        )
        return jnp.where(res.valid[:, None], out, 0.0)

    return jax.vmap(per_image)(proposals, class_probs, bbox_deltas, window)
