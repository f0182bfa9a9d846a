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
- reference_mrcnn_head.npz: the reference MaskRCNN ROI-pooling + raw-TF
  box/class head (maskrcnn.py:74-239) with its recorded random weights.

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
TOOLS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")


def golden_weights(g, seed):
    """Rebuild the seeded TF-variable values recorded by the generator
    (only names+shapes are stored; values regenerate deterministically)."""
    import sys

    sys.path.insert(0, TOOLS)
    from gen_reference_goldens import seeded_weights

    names = [str(n) for n in g["var_names"]]
    shapes = [tuple(int(d) for d in g[f"var_shape__{i}"]) for i in range(len(names))]
    return seeded_weights(list(zip(names, shapes)), seed=seed)


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


class TestReferenceBoxHead:
    """ops/roi_align + models/heads.BoxClassHead == the reference MaskRCNN
    ROI pooling + raw-TF classifier (maskrcnn.py:74-294), run with the
    reference's own recorded weights.

    The raw-TF head has no BN (maskrcnn.py:191-193 keeps matterport's
    small-batch advice); the flax head's FrozenBatchNorm is neutralized
    exactly with scale = sqrt(1 + eps).
    """

    def test_pooled_rois_match(self):
        g = load("reference_mrcnn_head.npz")
        import sys

        sys.path.insert(0, TOOLS)
        from gen_reference_goldens import make_mrcnn_head_inputs
        from objectdetection_tpu.ops.roi_align import (
            batched_multilevel_roi_align,
        )

        feats_np, proposals = make_mrcnn_head_inputs()
        feats = [jnp.asarray(f) for f in feats_np]
        got = batched_multilevel_roi_align(
            feats, jnp.asarray(proposals), (1024, 1024), (7, 7)
        )
        np.testing.assert_allclose(
            np.asarray(got), g["pooled"], atol=1e-4
        )

    def test_head_outputs_match(self):
        g = load("reference_mrcnn_head.npz")
        from objectdetection_tpu.models.heads import BoxClassHead

        nc = int(g["probs"].shape[-1])
        pooled = jnp.asarray(g["pooled"])  # [1, 100, 7, 7, 256]
        wvals = golden_weights(g, seed=1234)

        def w(name):
            return wvals[name.replace("__", "/") + ":0"]

        neutral_scale = np.full((1024,), np.sqrt(1.0 + 1e-3), np.float32)
        params = {
            "mrcnn_class_conv1": {
                # TF conv kernel [7,7,256,1024] flattens (y,x,c)-major,
                # matching pooled.reshape(b, r, ph*pw*c)
                "kernel": w("mrcnn_class_conv1__kernel").reshape(-1, 1024),
                "bias": w("mrcnn_class_conv1__bias"),
            },
            "mrcnn_class_conv2": {
                "kernel": w("mrcnn_class_conv2__kernel").reshape(1024, 1024),
                "bias": w("mrcnn_class_conv2__bias"),
            },
            "mrcnn_class_bn1": {
                "scale": neutral_scale, "bias": np.zeros(1024, np.float32),
            },
            "mrcnn_class_bn2": {
                "scale": neutral_scale, "bias": np.zeros(1024, np.float32),
            },
            "mrcnn_class_logits": {
                "kernel": w("mrcnn_class_scores__mrcnn_class_logits__kernel"),
                "bias": w("mrcnn_class_scores__mrcnn_class_logits__bias"),
            },
            "mrcnn_bbox_fc": {
                "kernel": w("mrcnn_class_bbox__mrcnn_bbox__kernel"),
                "bias": w("mrcnn_class_bbox__mrcnn_bbox__bias"),
            },
        }
        batch_stats = {
            f"mrcnn_class_bn{i}": {
                "mean": np.zeros(1024, np.float32),
                "var": np.ones(1024, np.float32),
            }
            for i in (1, 2)
        }
        head = BoxClassHead(num_classes=nc)
        logits, probs, bbox = head.apply(
            {"params": params, "batch_stats": batch_stats}, pooled
        )
        np.testing.assert_allclose(
            np.asarray(probs), g["probs"], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(bbox), g["bbox"], atol=1e-3
        )


class TestReferenceRPN:
    """models/rpn.RPNHead == the reference RPN raw-TF graph (rpn.py:72-148)
    with the reference's own recorded weights, single level at stride 1."""

    def test_rpn_outputs_match(self):
        g = load("reference_rpn.npz")
        import sys

        sys.path.insert(0, TOOLS)
        from gen_reference_goldens import make_rpn_input
        from objectdetection_tpu.models.rpn import RPNHead

        wvals = golden_weights(g, seed=4321)
        params = {
            name: {
                "kernel": wvals[f"{name}/kernel:0"],
                "bias": wvals[f"{name}/bias:0"],
            }
            for name in ("rpn_conv_shared", "rpn_class_raw", "rpn_bbox_pred")
        }
        head = RPNHead(anchors_per_location=3)
        logits, probs, deltas = head.apply(
            {"params": params}, [jnp.asarray(make_rpn_input())]
        )
        np.testing.assert_allclose(
            np.asarray(logits), g["logits"], atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(probs), g["probs"], atol=1e-5)
        np.testing.assert_allclose(np.asarray(deltas), g["bbox"], atol=1e-4)


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


@pytest.mark.slow  # full R101 f32 forward at 256² on CPU (compile-heavy)
class TestReferenceEndToEnd:
    """The WHOLE pipeline — FPN R101 → RPN → proposals → box head →
    detection layer — against values the reference's own graphs computed
    end-to-end on one seeded image with seeded weights
    (tools/gen_reference_goldens.py::gen_end_to_end, ≙ the reference
    inference path inference.py:74-213). This is the cross-implementation
    capstone: a failure in ANY stage's numerics surfaces here."""

    def _variables_and_cfg(self, g):
        import sys

        sys.path.insert(0, TOOLS)
        from gen_reference_goldens import (
            E2E_SEED_FPN,
            E2E_SEED_HEAD,
            E2E_SEED_RPN,
            seeded_net_weights,
        )
        from objectdetection_tpu import detector
        from objectdetection_tpu.config import COCO_CONFIG

        cfg = COCO_CONFIG.replace(
            image_shape=(256, 256, 3),
            image_min_dim=256,
            image_max_dim=256,
            num_classes=4,
            compute_dtype="float32",
            use_approx_topk=False,
        )
        variables = detector.init_variables(cfg, jax.random.PRNGKey(0))

        tfvals = {}
        for prefix, seed in (
            ("fpn", E2E_SEED_FPN), ("rpn", E2E_SEED_RPN),
            ("head", E2E_SEED_HEAD),
        ):
            names = [str(n) for n in g[f"{prefix}_var_names"]]
            shapes = [
                tuple(int(d) for d in g[f"{prefix}_var_shape__{i}"])
                for i in range(len(names))
            ]
            tfvals.update(
                seeded_net_weights(list(zip(names, shapes)), seed=seed)
            )

        # head layers need scope/reshape special-casing (raw-TF head:
        # nested scopes, conv-as-dense kernels, NO BatchNorm — neutralize
        # the flax head's FrozenBatchNorm with scale = sqrt(1 + eps))
        special = {
            ("mrcnn_class_conv1", "kernel"): lambda: tfvals[
                "mrcnn_class_conv1/kernel:0"
            ].reshape(-1, 1024),
            ("mrcnn_class_conv2", "kernel"): lambda: tfvals[
                "mrcnn_class_conv2/kernel:0"
            ].reshape(1024, 1024),
            ("mrcnn_class_logits", "kernel"): lambda: tfvals[
                "mrcnn_class_scores/mrcnn_class_logits/kernel:0"
            ],
            ("mrcnn_class_logits", "bias"): lambda: tfvals[
                "mrcnn_class_scores/mrcnn_class_logits/bias:0"
            ],
            ("mrcnn_bbox_fc", "kernel"): lambda: tfvals[
                "mrcnn_class_bbox/mrcnn_bbox/kernel:0"
            ],
            ("mrcnn_bbox_fc", "bias"): lambda: tfvals[
                "mrcnn_class_bbox/mrcnn_bbox/bias:0"
            ],
        }
        neutral = {
            ("mrcnn_class_bn1", "scale"): lambda: np.full(
                (1024,), np.sqrt(1.0 + 1e-3), np.float32
            ),
            ("mrcnn_class_bn2", "scale"): lambda: np.full(
                (1024,), np.sqrt(1.0 + 1e-3), np.float32
            ),
            ("mrcnn_class_bn1", "bias"): lambda: np.zeros(1024, np.float32),
            ("mrcnn_class_bn2", "bias"): lambda: np.zeros(1024, np.float32),
            ("mrcnn_class_bn1", "mean"): lambda: np.zeros(1024, np.float32),
            ("mrcnn_class_bn2", "mean"): lambda: np.zeros(1024, np.float32),
            ("mrcnn_class_bn1", "var"): lambda: np.ones(1024, np.float32),
            ("mrcnn_class_bn2", "var"): lambda: np.ones(1024, np.float32),
        }
        bn_leaf = {
            "scale": "gamma", "bias": "beta",
            "mean": "moving_mean", "var": "moving_variance",
        }

        flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
        new = []
        filled = 0
        for path, leaf in flat:
            keys = [getattr(p, "key", str(p)) for p in path]
            layer, leafn = keys[-2], keys[-1]
            fn = special.get((layer, leafn)) or neutral.get((layer, leafn))
            if fn is not None:
                val = fn()
            else:
                is_bn = layer.startswith("bn") or "_bn" in layer
                tf_leaf = bn_leaf.get(leafn, leafn) if is_bn else leafn
                val = tfvals.get(f"{layer}/{tf_leaf}:0")
            if val is None:
                new.append(leaf)  # mask head etc. — unused (with_masks off)
                continue
            assert tuple(val.shape) == tuple(np.asarray(leaf).shape), (
                layer, leafn, val.shape, leaf.shape,
            )
            new.append(jnp.asarray(val, leaf.dtype))
            filled += 1
        assert filled > 600, filled  # R101 + FPN + RPN + head
        return jax.tree_util.tree_unflatten(treedef, new), cfg

    def test_full_pipeline_matches(self):
        g = load("reference_end_to_end.npz")
        from objectdetection_tpu import detector
        from objectdetection_tpu.anchors import config_anchors

        variables, cfg = self._variables_and_cfg(g)

        # anchors: ours == the reference's gen_anchors table
        anchors = np.asarray(config_anchors(cfg))
        np.testing.assert_allclose(anchors, g["anchors"][0], atol=1e-6)

        det, inter = jax.jit(
            lambda v, i, w: detector.forward_inference(
                v, i, w, cfg, with_masks=False, return_intermediates=True
            )
        )(variables, jnp.asarray(g["image"]), jnp.asarray(g["window"]))

        # pyramid (the 101-layer accumulation bounds the tolerance)
        for i in (2, 3, 4, 5, 6):
            np.testing.assert_allclose(
                np.asarray(inter["pyramid"][f"p{i}"]), g[f"p{i}"],
                atol=5e-3, err_msg=f"P{i}",
            )
        np.testing.assert_allclose(
            np.asarray(inter["rpn_class_probs"]), g["rpn_probs"], atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(inter["rpn_bbox"]), g["rpn_deltas"], atol=2e-3
        )

        # proposals: compare by IoU matching (boundary-rank rows may swap)
        ours = np.asarray(inter["proposals"][0])
        ref = g["proposals"][0]
        m = _match_rate(ref[:500], ours, iou_thr=0.995)
        assert m > 0.98, m

        # final detections: every confident reference detection must have
        # an IoU/class/score-matching counterpart
        dref = g["detections"][0]
        dours = np.concatenate(
            [
                np.asarray(det.boxes[0]),
                np.asarray(det.class_ids[0])[:, None].astype(np.float32),
                np.asarray(det.scores[0])[:, None],
            ],
            axis=1,
        )
        ref_rows = dref[dref[:, 5] > 0.75]
        our_rows = dours[dours[:, 5] > 0.0]
        assert len(ref_rows) > 10  # the golden must be non-vacuous
        matched = 0
        for r in ref_rows:
            # box match: L∞ coordinate distance (handles the zero-area
            # boxes whose IoU is degenerate) or IoU > 0.9
            linf = np.abs(our_rows[:, :4] - r[None, :4]).max(axis=1)
            iou = _iou_one_to_many(r[:4], our_rows[:, :4])
            box_ok = (linf <= 2e-3) | (iou > 0.9)
            cls_ok = our_rows[:, 4].astype(int) == int(r[4])
            score_ok = np.abs(our_rows[:, 5] - r[5]) < 0.05
            if (box_ok & cls_ok & score_ok).any():
                matched += 1
        assert matched >= 0.9 * len(ref_rows), (matched, len(ref_rows))


def _iou_one_to_many(box, boxes):
    y1 = np.maximum(box[0], boxes[:, 0])
    x1 = np.maximum(box[1], boxes[:, 1])
    y2 = np.minimum(box[2], boxes[:, 2])
    x2 = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(y2 - y1, 0, None) * np.clip(x2 - x1, 0, None)
    a = (box[2] - box[0]) * (box[3] - box[1])
    b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / (a + b - inter + 1e-9)


def _match_rate(ref, ours, iou_thr, coord_tol=2e-3):
    """Fraction of nonzero ref rows with a counterpart in ours: either
    coordinates equal within `coord_tol` (L∞) — required for the many
    ZERO-AREA proposals clipped flat against the window, whose IoU is
    0/0 — or IoU >= iou_thr."""
    hits = 0
    for r in ref:
        if (r == 0).all():
            continue
        linf = np.abs(ours - r[None, :]).max(axis=1)
        if linf.min() <= coord_tol or _iou_one_to_many(r, ours).max() >= iou_thr:
            hits += 1
    n = max((np.abs(ref).sum(1) > 0).sum(), 1)
    return hits / n


def _tools(name):
    import sys

    sys.path.insert(0, TOOLS)
    import gen_reference_goldens as gen

    return getattr(gen, name)


def he_golden_weights(g, seed):
    """Rebuild He-scaled seeded TF-variable values (deep-net goldens)."""
    names = [str(n) for n in g["var_names"]]
    shapes = [
        tuple(int(d) for d in g[f"var_shape__{i}"]) for i in range(len(names))
    ]
    return _tools("he_seeded_weights")(list(zip(names, shapes)), seed=seed)


class TestReferenceDetectionTargets:
    """layers/targets.detection_targets == the reference's executed
    `BuildDetectionTargets` graph (data_processor.py:430-658).

    The fixture's inputs are engineered so BOTH samplers keep every eligible
    proposal (16 pos ≤ 66 budget, 24 neg ≤ 32 scaled budget) — outputs are
    deterministic as sets; only the shuffle order differs. Compared:
    the IoU matrix + per-proposal max exactly, the positive/negative ROI
    sets, and the per-ROI (class id, box delta) assignment."""

    def _mine(self, g):
        from objectdetection_tpu.config import COCO_CONFIG
        from objectdetection_tpu.layers.targets import detection_targets

        cfg = COCO_CONFIG.replace(
            train_rois_per_image=int(g["train_rois_per_image"]),
            bbox_stddev=tuple(float(v) for v in g["bbox_stddev"]),
        )
        return detection_targets(
            jnp.asarray(g["proposals"]),
            jnp.asarray(g["gt_boxes"]),
            jnp.asarray(g["gt_class_ids"]),
            cfg,
            jax.random.PRNGKey(7),
        )

    def test_iou_matrix_matches(self):
        g = load("reference_detection_targets.npz")
        from objectdetection_tpu.geometry import iou_matrix

        n_prop, n_gt = g["iou"].shape
        mine = np.asarray(
            iou_matrix(
                jnp.asarray(g["proposals"][:n_prop]),
                jnp.asarray(g["gt_boxes"][:n_gt]),
            )
        )
        np.testing.assert_allclose(mine, g["iou"], atol=1e-6)
        np.testing.assert_allclose(
            mine.max(axis=1), g["roi_iou_max"], atol=1e-6
        )

    def test_sampled_sets_and_assignments_match(self):
        g = load("reference_detection_targets.npz")
        out = self._mine(g)

        ref_pos_n = int(g["pos_count"])
        assert int(np.asarray(out.pos_mask).sum()) == ref_pos_n

        # reference packs positives first, then negatives, then zero pad
        ref_rois = g["rois"]
        ref_cls = g["roi_gt_class_ids"][0]
        ref_deltas = g["roi_gt_box_deltas"]
        ref_valid_n = int((np.abs(ref_rois).sum(1) > 0).sum())

        def key(row):
            return tuple(np.round(row.astype(np.float64), 6))

        ref_pos = {
            key(ref_rois[i]): (int(ref_cls[i]), ref_deltas[i])
            for i in range(ref_pos_n)
        }
        ref_neg = {key(ref_rois[i]) for i in range(ref_pos_n, ref_valid_n)}

        rois = np.asarray(out.rois)
        pos_mask = np.asarray(out.pos_mask)
        valid = np.asarray(out.valid_mask)
        my_pos = {
            key(rois[i]): (
                int(out.target_class_ids[i]),
                np.asarray(out.target_deltas[i]),
            )
            for i in range(len(rois))
            if pos_mask[i]
        }
        my_neg = {key(rois[i]) for i in range(len(rois)) if valid[i] and not pos_mask[i]}

        assert set(ref_pos) == set(my_pos)
        assert ref_neg == my_neg
        for k, (ref_c, ref_d) in ref_pos.items():
            my_c, my_d = my_pos[k]
            assert my_c == ref_c, (k, my_c, ref_c)
            np.testing.assert_allclose(my_d, ref_d, atol=2e-5)


class TestReferenceLosses:
    """losses.py == the reference's executed loss graphs
    (loss_optimize.py:6-201), including the binary-CE mrcnn_box bug via
    `compat_reference=True`. Inputs regenerate from the generator's seeds."""

    def test_losses_match(self):
        g = load("reference_losses.npz")
        from objectdetection_tpu import losses

        x = _tools("make_loss_inputs")()
        rpn_cls = losses.rpn_class_loss(
            jnp.asarray(x["target_class"]), jnp.asarray(x["rpn_logits"])
        )
        np.testing.assert_allclose(
            float(rpn_cls), float(g["rpn_class_loss"]), rtol=1e-5
        )

        rpn_box = losses.rpn_box_loss(
            jnp.asarray(x["rpn_target_bbox"]),
            jnp.asarray(x["rpn_pred_box"]),
            jnp.asarray(x["target_class"]),
        )
        np.testing.assert_allclose(
            float(rpn_box), float(g["rpn_box_loss"]), rtol=1e-5
        )

        mr_cls = losses.mrcnn_class_loss(
            jnp.asarray(x["mrcnn_target_class"]),
            jnp.asarray(x["mrcnn_logits"]),
            jnp.asarray(x["active"]),
        )
        np.testing.assert_allclose(
            float(mr_cls), float(g["mrcnn_class_loss"]), rtol=1e-5
        )

        mr_box = losses.mrcnn_box_loss(
            jnp.asarray(x["mrcnn_target_box"]),
            jnp.asarray(x["mrcnn_pred_box"]),
            jnp.asarray(x["mrcnn_target_class"]),
            compat_reference=True,
        )
        np.testing.assert_allclose(
            float(mr_box), float(g["mrcnn_box_loss"]), rtol=1e-5
        )


class TestReferenceMaskHead:
    """models/heads.MaskHead == the reference mask-head spec
    (masking.py:34-68) built and EXECUTED in raw TF1 by the generator
    (4× conv3×3(256)+BN+relu → deconv2×2 s2 relu → 1×1 sigmoid)."""

    def test_mask_head_matches(self):
        g = load("reference_mask_head.npz")
        from objectdetection_tpu.models.heads import MaskHead

        w = he_golden_weights(g, seed=8080)
        pooled = _tools("make_mask_head_inputs")()
        nc = int(g["masks"].shape[-1])

        params, stats = {}, {}
        for i in range(1, 5):
            params[f"mrcnn_mask_conv{i}"] = {
                "kernel": jnp.asarray(w[f"mrcnn_mask_conv{i}/kernel:0"]),
                "bias": jnp.asarray(w[f"mrcnn_mask_conv{i}/bias:0"]),
            }
            params[f"mrcnn_mask_bn{i}"] = {
                "scale": jnp.asarray(w[f"mrcnn_mask_bn{i}/gamma:0"]),
                "bias": jnp.asarray(w[f"mrcnn_mask_bn{i}/beta:0"]),
            }
            stats[f"mrcnn_mask_bn{i}"] = {
                "mean": jnp.asarray(w[f"mrcnn_mask_bn{i}/moving_mean:0"]),
                "var": jnp.asarray(w[f"mrcnn_mask_bn{i}/moving_variance:0"]),
            }
        # TF conv2d_transpose filter is [kh, kw, out, in] with
        # gradient-of-conv semantics (spatially flipped); flax ConvTranspose
        # wants an unflipped [kh, kw, in, out] kernel.
        wd = w["mrcnn_mask_deconv/kernel:0"]
        params["mrcnn_mask_deconv"] = {
            "kernel": jnp.asarray(
                np.transpose(np.flip(wd, axis=(0, 1)), (0, 1, 3, 2))
            ),
            "bias": jnp.asarray(w["mrcnn_mask_deconv/bias:0"]),
        }
        params["mrcnn_mask"] = {
            "kernel": jnp.asarray(w["mrcnn_mask/kernel:0"]),
            "bias": jnp.asarray(w["mrcnn_mask/bias:0"]),
        }

        head = MaskHead(num_classes=nc)
        masks = head.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(pooled)[None]
        )
        np.testing.assert_allclose(
            np.asarray(masks)[0], g["masks"], atol=2e-5
        )


class TestReferenceVGG16:
    """models/vgg16.VGG16 == the reference FasterRCNN VGG feature extractor
    (vgg.py:10-96), executed with He-seeded assigned weights."""

    def test_feature_map_matches(self):
        g = load("reference_vgg16.npz")
        from objectdetection_tpu.models.vgg16 import VGG16

        w = he_golden_weights(g, seed=1618)
        img = _tools("make_vgg_input")()
        params = {}
        for name in {str(n).split("/")[0] for n in g["var_names"]}:
            params[name] = {
                "kernel": jnp.asarray(w[f"{name}/{name}_W:0"]),
                "bias": jnp.asarray(w[f"{name}/{name}_b:0"]),
            }
        feat = VGG16().apply({"params": params}, jnp.asarray(img))
        np.testing.assert_allclose(
            np.asarray(feat), g["feature_map"], atol=5e-4, rtol=1e-4
        )


class TestReferenceFasterRCNNRPN:
    """models/faster_rcnn.FasterRCNNRPN == the reference FasterRCNN RPN
    (FasterRCNN/building_blocks/rpn.py:9-97), executed with seeded weights.
    The reference convs have NO bias (raw tf.nn.conv2d) — biases zeroed."""

    def test_rpn_outputs_match(self):
        g = load("reference_frcnn_rpn.npz")
        from objectdetection_tpu.models.faster_rcnn import FasterRCNNRPN

        w = golden_weights(g, seed=2222)
        fmap = _tools("make_frcnn_rpn_input")()
        params = {
            "rpn_conv": {
                "kernel": jnp.asarray(w["rpn_conv_w:0"]),
                "bias": jnp.zeros((512,)),
            },
            "rpn_class": {
                "kernel": jnp.asarray(w["rpn_cls_w:0"]),
                "bias": jnp.zeros((18,)),
            },
            "rpn_bbox": {
                "kernel": jnp.asarray(w["rpn_reg_w:0"]),
                "bias": jnp.zeros((36,)),
            },
        }
        logits, fg, deltas = FasterRCNNRPN().apply(
            {"params": params}, jnp.asarray(fmap)
        )
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        b, h, w_, k2 = g["probs"].shape
        ref_probs = g["probs"].reshape(b, h, w_, k2 // 2, 2)
        np.testing.assert_allclose(probs, ref_probs, atol=1e-5)
        ref_deltas = g["bbox"].reshape(b, h, w_, 9, 4)
        np.testing.assert_allclose(np.asarray(deltas), ref_deltas, atol=1e-5)
        # fg prob = per-anchor second softmax column
        np.testing.assert_allclose(
            np.asarray(fg), ref_probs[..., 1], atol=1e-5
        )
