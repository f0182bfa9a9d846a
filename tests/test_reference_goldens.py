"""Cross-implementation parity vs goldens computed BY the reference's code.

The fixtures in golden/reference_*.npz were produced by actually executing
the reference TF graphs (tools/gen_reference_goldens.py) on seeded random
inputs:

- reference_proposals.npz: the reference Proposals graph
  (proposals_tf.py:98-326) on the committed debug-harness seeding
  (seed 325, proposals_tf.py:334-343).
- reference_detection.npz: the reference DetectionLayer
  (detection.py:56-260) on its debug-harness seeding (seed 863,
  detection.py:285-309).
- reference_crop_resize.npz: raw `tf.image.crop_and_resize` — the native
  op behind the reference ROIAlign (maskrcnn.py:152-154).

Unlike test_golden_regression.py (self-generated refactor guard), a failure
here means this framework's numerics drifted from the REFERENCE's own
computed values.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def load(name):
    path = os.path.join(GOLDEN, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} missing — run tools/gen_reference_goldens.py")
    return np.load(path)


class TestReferenceProposals:
    """layers/proposals.py == reference Proposals graph (1e-3)."""

    @pytest.mark.parametrize("training", [False, True])
    def test_proposals_match(self, training):
        g = load("reference_proposals.npz")
        from objectdetection_tpu.config import COCO_CONFIG
        from objectdetection_tpu.layers.proposals import proposal_layer

        cfg = COCO_CONFIG.replace(
            rpn_bbox_stddev=tuple(float(v) for v in g["rpn_bbox_stddev"]),
            pre_nms_rois_count=int(g["pre_nms"]),
            post_nms_rois_inference=int(g["post_nms_inference"]),
            post_nms_rois_training=int(g["post_nms_training"]),
            rpn_nms_threshold=float(g["nms_threshold"]),
            use_approx_topk=False,
        )
        want = g["proposals_training" if training else "proposals_inference"]
        # the reference feeds per-image anchor tensors; this framework shares
        # anchors across the batch, so run per image
        for b in range(g["probs"].shape[0]):
            got = proposal_layer(
                jnp.asarray(g["probs"][b : b + 1]),
                jnp.asarray(g["deltas"][b : b + 1]),
                jnp.asarray(g["anchors"][b]),
                cfg,
                training=training,
            )
            got = np.asarray(got[0])
            n_want = int((np.abs(want[b]).sum(axis=1) > 0).sum())
            n_got = int((np.abs(got).sum(axis=1) > 0).sum())
            assert n_got == n_want, (b, n_got, n_want)
            np.testing.assert_allclose(
                got[:n_want], want[b, :n_want], atol=1e-3,
                err_msg=f"batch {b}",
            )


class TestReferenceDetection:
    """layers/detection.py == reference DetectionLayer (1e-3).

    Both emit normalized boxes (the reference denorms later, in
    unmold_detection, detection.py:8-53); the window input is normalized
    with the reference's (h-1, w-1) convention before the call.
    """

    def test_detections_match(self):
        g = load("reference_detection.npz")
        from objectdetection_tpu.config import COCO_CONFIG
        from objectdetection_tpu.geometry import norm_boxes
        from objectdetection_tpu.layers.detection import detection_layer

        cfg = COCO_CONFIG.replace(
            num_classes=int(g["probs"].shape[-1]),
            bbox_stddev=tuple(float(v) for v in g["bbox_stddev"]),
            detection_min_threshold=float(g["min_confidence"]),
            detection_nms_threshold=float(g["nms_threshold"]),
            detection_post_nms_instances=int(g["max_instances"]),
        )
        image_shape = tuple(int(v) for v in g["image_shape"][:2])
        win_norm = np.asarray(
            norm_boxes(jnp.asarray(g["window"], jnp.float32), image_shape)
        )
        got = detection_layer(
            jnp.asarray(g["proposals"]),
            jnp.asarray(g["probs"]),
            jnp.asarray(g["deltas"]),
            jnp.asarray(win_norm),
            cfg,
        )
        got = np.asarray(got[0])

        want = g["detections"][0]
        n_want = int((np.abs(want).sum(axis=1) > 0).sum())
        n_got = int((np.abs(got).sum(axis=1) > 0).sum())
        assert n_got == n_want, (n_got, n_want)
        np.testing.assert_allclose(
            got[:n_want, :4], want[:n_want, :4], atol=1e-3
        )
        np.testing.assert_array_equal(
            got[:n_got, 4].astype(np.int32), want[:n_want, 4].astype(np.int32)
        )
        np.testing.assert_allclose(
            got[:n_got, 5], want[:n_want, 5], atol=1e-4
        )


class TestReferenceCropAndResize:
    """ops/roi_align.crop_and_resize == tf.image.crop_and_resize (1e-5),
    including boxes extending outside the image (zero extrapolation)."""

    @pytest.mark.parametrize("size", [7, 14])
    def test_crop_matches(self, size):
        g = load("reference_crop_resize.npz")
        from objectdetection_tpu.ops.roi_align import crop_and_resize

        fmap = g["fmap"]
        boxes = g["boxes"]
        box_ind = g["box_ind"]
        want = g[f"crop{size}"]
        for img_idx in np.unique(box_ind):
            sel = box_ind == img_idx
            got = crop_and_resize(
                jnp.asarray(fmap[img_idx]),
                jnp.asarray(boxes[sel]),
                (size, size),
            )
            np.testing.assert_allclose(
                np.asarray(got), want[sel], atol=1e-5,
                err_msg=f"img {img_idx} size {size}",
            )
