"""Direct-execution oracles: IMPORT the reference's pure-numpy code and run
it in-process against this framework's layers.

Unlike the npz goldens (tools/gen_reference_goldens.py), these tests execute
the reference *at test time*:

- `PreprareTrainData.build_rpn_targets` (MaskRCNN/building_blocks/
  data_processor.py:173-294) — the host-numpy RPN target builder — as the
  oracle for `layers/targets.rpn_targets`.
- The FasterRCNN numpy proposal pipeline (FasterRCNN/building_blocks/
  proposals.py:44-520): `get_anchors`, the anchor+shift grid (captured by
  spying the executed `Proposals.build`), `corner_pixels_to_center_inv`,
  `FilterBoxes.clip_boxes/filter_min_size`, and the standalone serial
  `non_max_suppression` — as oracles for `models/faster_rcnn.py`.

Reference randomness (np.random.choice / tf.random_shuffle analogs) makes
row ORDER implementation-defined, so sampled outputs are compared set-wise
with deterministic-by-construction budgets; see each test.

No reference code is copied — the module-scope fixture imports it from
/root/reference with the same compat shims the golden generator uses
(tensorflow→compat.v1, skimage stub, np.int alias for the pre-1.24 numpy
the reference was written against).
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")

    import tensorflow.compat.v1 as tf1

    tf1.disable_eager_execution()
    had_tf = sys.modules.get("tensorflow")
    sys.modules["tensorflow"] = tf1

    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        transform = types.ModuleType("skimage.transform")
        transform.resize = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("skimage stub")
        )
        skimage.transform = transform
        sys.modules["skimage"] = skimage
        sys.modules["skimage.transform"] = transform

    had_np_int = hasattr(np, "int")
    if not had_np_int:
        np.int = int  # proposals.py:135 (numpy < 1.24 era)

    cwd = os.getcwd()
    # the reference modules configure logging to write logfile.log into CWD
    os.chdir(tmp_path_factory.mktemp("reflogs"))
    sys.path.insert(0, REFERENCE)
    try:
        from MaskRCNN.building_blocks import data_processor
        from FasterRCNN.building_blocks import proposals as frcnn
    finally:
        os.chdir(cwd)

    yield types.SimpleNamespace(data_processor=data_processor, frcnn=frcnn)

    sys.path.remove(REFERENCE)
    if not had_np_int:
        del np.int
    if had_tf is None:
        sys.modules.pop("tensorflow", None)
    else:
        sys.modules["tensorflow"] = had_tf


# ---------------------------------------------------------------------------
# MaskRCNN build_rpn_targets oracle
# ---------------------------------------------------------------------------


def _run_reference_rpn_targets(ref, anchors, gt, budget, seed=0):
    """Execute the reference's numpy RPN-target builder on a shimmed
    instance (its __init__ needs a full Dataset; build_rpn_targets itself
    reads only these four attributes)."""
    dp = ref.data_processor
    obj = dp.PreprareTrainData.__new__(dp.PreprareTrainData)
    obj.anchors = anchors
    obj.anchor_area = (anchors[:, 2] - anchors[:, 0]) * (
        anchors[:, 3] - anchors[:, 1]
    )
    obj.max_rpn_targets = budget
    obj.bbox_std_dev = np.array([0.1, 0.1, 0.2, 0.2])
    np.random.seed(seed)  # the reference subsamples via global numpy state
    return obj.build_rpn_targets(gt)


def _my_rpn_targets(anchors, gt, budget):
    from objectdetection_tpu.config import SHAPES_CONFIG
    from objectdetection_tpu.layers.targets import rpn_targets

    cfg = SHAPES_CONFIG.replace(
        rpn_train_anchors_per_image=budget,
        rpn_bbox_stddev=(0.1, 0.1, 0.2, 0.2),
    )
    return rpn_targets(
        jnp.asarray(anchors),
        jnp.asarray(gt, jnp.float32),
        jnp.ones((gt.shape[0],), bool),
        cfg,
        jax.random.PRNGKey(3),
    )


def _pyramid_anchors_128():
    from objectdetection_tpu.anchors import pyramid_anchors_pixel
    from objectdetection_tpu.config import SHAPES_CONFIG

    c = SHAPES_CONFIG
    return pyramid_anchors_pixel(
        (128, 128),
        tuple(c.rpn_anchor_scales),
        tuple(c.rpn_anchor_ratios),
        tuple(c.backbone_strides),
        c.rpn_anchor_stride,
    ).astype(np.float64)


class TestReferenceRPNTargetsOracle:
    """layers/targets.rpn_targets vs the executed reference builder.

    Positives are deterministic when they fit the half-budget (no positive
    subsample on either side): positions of the +1 class and the packed
    delta rows (both sides pack by ascending anchor index,
    data_processor.py:266-292) must match exactly. Negative subsampling is
    random on both sides → compare the count and that the reference's
    choices are a subset of the eligible set."""

    def test_deterministic_positive_regime(self, ref):
        anchors = _pyramid_anchors_128()
        rng = np.random.RandomState(5)
        g = 4
        cy, cx = rng.rand(g) * 80 + 24, rng.rand(g) * 80 + 24
        hh, hw = rng.rand(g) * 12 + 6, rng.rand(g) * 12 + 6
        gt = np.stack([cy - hh, cx - hw, cy + hh, cx + hw], 1)
        budget = 256

        pos_anchors, ref_cls, ref_deltas = _run_reference_rpn_targets(
            ref, anchors, gt, budget
        )
        n_pos = int((ref_cls == 1).sum())
        assert 0 < n_pos <= budget // 2  # no positive subsample happened

        mine = _my_rpn_targets(anchors, gt, budget)
        my_cls = np.asarray(mine.target_class)

        np.testing.assert_array_equal(
            np.where(my_cls == 1)[0], np.where(ref_cls == 1)[0]
        )
        assert int(mine.num_positives) == n_pos
        np.testing.assert_allclose(
            np.asarray(mine.target_deltas)[:n_pos],
            ref_deltas[:n_pos],
            atol=1e-5,
        )
        # positive anchor boxes themselves (ascending anchor order)
        np.testing.assert_allclose(
            anchors[np.where(my_cls == 1)[0]], pos_anchors, atol=0
        )

        # negatives: equal count, reference's subset of the eligible set
        assert int((my_cls == -1).sum()) == int((ref_cls == -1).sum()) == (
            budget - n_pos
        )
        from objectdetection_tpu.geometry import iou_matrix

        iou = np.asarray(
            iou_matrix(jnp.asarray(anchors, jnp.float32), jnp.asarray(gt, jnp.float32))
        )
        anchor_max = iou.max(1)
        forced = np.zeros(len(anchors), bool)
        forced[iou.argmax(0)] = True
        eligible_neg = (anchor_max < 0.3) & ~forced
        assert eligible_neg[np.where(ref_cls == -1)[0]].all()
        assert eligible_neg[np.where(my_cls == -1)[0]].all()

    def test_positive_subsample_regime(self, ref):
        anchors = _pyramid_anchors_128()
        # 8 GT boxes that each exactly equal one well-separated 32² ratio-1
        # anchor (IoU 1.0) ⇒ exactly 8 positives; budget 8 forces both sides
        # into the positive-subsample branch (keep budget//2 = 4)
        hw = np.stack(
            [anchors[:, 2] - anchors[:, 0], anchors[:, 3] - anchors[:, 1]], 1
        )
        sq32 = np.where(
            (np.abs(hw[:, 0] - 32) < 1e-6)
            & (np.abs(hw[:, 1] - 32) < 1e-6)
            & (anchors[:, :2] >= 0).all(1)
            & (anchors[:, 2:] <= 128).all(1)
        )[0]
        centers = (anchors[sq32, :2] + anchors[sq32, 2:]) / 2
        picked, taken = [], []
        for k in np.argsort(centers[:, 0] * 1000 + centers[:, 1]):
            c = centers[k]
            if all(np.abs(c - centers[t]).max() >= 48 for t in taken):
                taken.append(k)
                picked.append(sq32[k])
            if len(picked) == 8:
                break
        assert len(picked) == 8
        gt = anchors[picked].copy()
        budget = 8

        _, ref_cls, _ = _run_reference_rpn_targets(ref, anchors, gt, budget)
        mine = _my_rpn_targets(anchors, gt, budget)
        my_cls = np.asarray(mine.target_class)

        # both subsample positives down to the half budget
        assert int((ref_cls == 1).sum()) == int((my_cls == 1).sum()) == 4
        # both draw from the same eligible positive pool
        from objectdetection_tpu.geometry import iou_matrix

        iou = np.asarray(
            iou_matrix(jnp.asarray(anchors, jnp.float32), jnp.asarray(gt, jnp.float32))
        )
        eligible_pos = (iou.max(1) >= 0.7)
        eligible_pos[iou.argmax(0)] = True
        assert eligible_pos[np.where(ref_cls == 1)[0]].all()
        assert eligible_pos[np.where(my_cls == 1)[0]].all()


# ---------------------------------------------------------------------------
# FasterRCNN numpy proposal pipeline oracles
# ---------------------------------------------------------------------------


def _frcnn_inputs():
    rng = np.random.RandomState(11)
    fg = rng.rand(1, 14, 14, 9).astype("float32")
    probs18 = np.concatenate(
        [fg, rng.rand(1, 14, 14, 9).astype("float32")], axis=-1
    )  # the reference slices channels [:9] as foreground (proposals.py:477)
    deltas = (rng.randn(1, 14, 14, 36) * 0.3).astype("float32")
    return fg, probs18, deltas


def _run_reference_build_with_spy(ref):
    """Execute the reference Proposals.build (mode='test') and capture the
    anchor grid + decoded boxes it actually computed, by spying on its own
    corner_pixels_to_center_inv call."""
    _, probs18, deltas = _frcnn_inputs()
    rec = {}
    orig = ref.frcnn.corner_pixels_to_center_inv

    def spy(anchor_boxes, pred_box_deltas):
        out = orig(anchor_boxes, pred_box_deltas)
        rec["anchors"] = anchor_boxes.copy()
        rec["deltas"] = pred_box_deltas.copy()
        # FilterBoxes.clip_boxes mutates this array IN PLACE downstream
        rec["boxes"] = out.copy()
        return out

    ref.frcnn.corner_pixels_to_center_inv = spy
    try:
        obj = ref.frcnn.Proposals("test", probs18, deltas)
    finally:
        ref.frcnn.corner_pixels_to_center_inv = orig
    rec["scores"] = probs18[:, :, :, :9].reshape(-1, 1)
    rec["final"] = obj.get_proposals()
    return rec


class TestFasterRCNNProposalOracle:
    def test_base_anchors_executed(self, ref):
        from objectdetection_tpu.models.faster_rcnn import ZF_ANCHORS

        np.testing.assert_array_equal(ref.frcnn.get_anchors(), ZF_ANCHORS)

    def test_grid_and_decode_match_executed_build(self, ref):
        from objectdetection_tpu.models import faster_rcnn as fr

        rec = _run_reference_build_with_spy(ref)
        mine_anchors = fr.zf_grid_anchors((14, 14), 16)
        np.testing.assert_array_equal(rec["anchors"], mine_anchors)

        mine_boxes = np.asarray(
            fr.decode_zf_deltas(
                jnp.asarray(mine_anchors), jnp.asarray(rec["deltas"])
            )
        )
        np.testing.assert_allclose(mine_boxes, rec["boxes"], atol=2e-3)

    def test_reference_filterboxes_argsort_bug_documented(self, ref):
        """The reference's FilterBoxes.nms sorts `scores.argsort()` on an
        [N, 1] array (proposals.py:352) — argsort along the LAST axis, all
        zeros — so the executed end-to-end pipeline degenerates to a single
        repeated box. Pin that executed behavior here; the stitched test
        below compares against the evident intent."""
        rec = _run_reference_build_with_spy(ref)
        final = rec["final"]
        assert final.shape[1] == 5  # [batch_idx, x1, y1, x2, y2]
        assert final.shape[0] == 1  # ONE survivor: N copies of row 0 → NMS

    def test_stitched_intent_pipeline_matches_zf_layer(self, ref):
        """clip → min-size → (raveled) score order → serial NMS, every stage
        the reference's own executed code except the one-line ravel fix for
        the argsort-axis bug, vs zf_proposal_layer end-to-end."""
        from objectdetection_tpu.config import FasterRCNNConfig
        from objectdetection_tpu.models import faster_rcnn as fr

        rec = _run_reference_build_with_spy(ref)
        fb = ref.frcnn.FilterBoxes(
            [224, 224, 3], 16, 6000, 300, 0.2,
            rec["boxes"].copy(), rec["scores"].copy(),
        )
        fb.clip_boxes()
        fb.filter_min_size()
        order = fb.scores.ravel().argsort()[::-1][:6000]
        ref_keep = ref.frcnn.non_max_suppression(
            fb.boxes[order], fb.scores[order], 0.2, 300
        )

        fg, _, deltas = _frcnn_inputs()
        props, valid = fr.zf_proposal_layer(
            jnp.asarray(fg),
            jnp.asarray(deltas.reshape(1, 14, 14, 9, 4)),
            FasterRCNNConfig(),
        )
        mine = np.asarray(props)[0][np.asarray(valid)[0]]
        assert mine.shape == ref_keep.shape, (mine.shape, ref_keep.shape)
        np.testing.assert_allclose(mine, ref_keep, atol=5e-2)

    def test_nms_plus_one_semantics(self, ref):
        """ops/nms vs the reference's serial numpy NMS (+1 pixel areas,
        proposals.py:127-169). The +1 convention maps onto the continuous
        IoU kernel by shifting the max corners by +1."""
        from objectdetection_tpu.ops.nms import non_max_suppression

        rng = np.random.RandomState(21)
        n = 64
        x1 = rng.rand(n) * 180
        y1 = rng.rand(n) * 180
        # include thin/degenerate boxes: zero-width in continuous coords
        w = np.where(rng.rand(n) < 0.2, 0.0, rng.rand(n) * 60)
        h = np.where(rng.rand(n) < 0.2, 0.0, rng.rand(n) * 60)
        boxes = np.stack([x1, y1, x1 + w, y1 + h], 1)
        scores = rng.rand(n).astype("float32")

        ref_keep = ref.frcnn.non_max_suppression(
            boxes.copy(), scores.reshape(-1, 1).copy(), 0.3, 24
        )

        shifted = boxes + np.array([0.0, 0.0, 1.0, 1.0])
        res = non_max_suppression(
            jnp.asarray(shifted, jnp.float32), jnp.asarray(scores), 24, 0.3
        )
        idx = np.asarray(res.indices)[np.asarray(res.valid)]
        np.testing.assert_allclose(boxes[idx], ref_keep, atol=1e-5)
