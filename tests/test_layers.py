"""Proposal / detection / target layer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetection_tpu.config import SHAPES_CONFIG
from objectdetection_tpu.geometry import apply_box_deltas, encode_box_deltas
from objectdetection_tpu.layers.detection import detection_layer
from objectdetection_tpu.layers.proposals import proposal_layer
from objectdetection_tpu.layers.targets import detection_targets, rpn_targets


CFG = SHAPES_CONFIG.replace(
    pre_nms_rois_count=128, post_nms_rois_training=32, post_nms_rois_inference=16,
    train_rois_per_image=12, rpn_train_anchors_per_image=16,
)


def make_anchors(n, rng):
    c = rng.rand(n, 2) * 0.8 + 0.1
    s = rng.rand(n, 2) * 0.1 + 0.05
    return np.concatenate([c - s, c + s], axis=1).astype(np.float32)


class TestProposalLayer:
    def test_recovers_high_score_box(self):
        rng = np.random.RandomState(0)
        a = 300
        anchors = make_anchors(a, rng)
        probs = np.zeros((1, a, 2), np.float32)
        probs[..., 0] = 0.9
        probs[..., 1] = 0.1
        probs[0, 7] = [0.01, 0.99]  # one clear foreground anchor
        deltas = np.zeros((1, a, 4), np.float32)
        out = np.asarray(
            proposal_layer(
                jnp.asarray(probs), jnp.asarray(deltas), jnp.asarray(anchors), CFG
            )
        )
        assert out.shape == (1, 16, 4)
        np.testing.assert_allclose(out[0, 0], anchors[7], atol=1e-5)

    def test_deltas_scaled_by_stddev(self):
        rng = np.random.RandomState(1)
        anchors = make_anchors(10, rng)
        probs = np.tile(np.array([[0.2, 0.8]], np.float32), (10, 1))[None]
        raw = rng.randn(1, 10, 4).astype(np.float32) * 0.5
        out = proposal_layer(
            jnp.asarray(probs), jnp.asarray(raw), jnp.asarray(anchors), CFG
        )
        # expected: decode with deltas * rpn_bbox_stddev then clip
        expected = apply_box_deltas(
            jnp.asarray(anchors),
            jnp.asarray(raw[0] * np.array(CFG.rpn_bbox_stddev, np.float32)),
        )
        expected = jnp.clip(expected, 0.0, 1.0)
        # the top-scoring proposals must be among expected rows
        got = np.asarray(out)[0]
        exp = np.asarray(expected)
        nonzero = got[np.abs(got).sum(1) > 0]
        for row in nonzero:
            assert np.min(np.abs(exp - row).sum(1)) < 1e-4

    def test_batched(self):
        rng = np.random.RandomState(2)
        anchors = jnp.asarray(make_anchors(50, rng))
        probs = jnp.asarray(rng.rand(3, 50, 2).astype(np.float32))
        deltas = jnp.asarray(rng.randn(3, 50, 4).astype(np.float32) * 0.1)
        out = proposal_layer(probs, deltas, anchors, CFG, training=True)
        assert out.shape == (3, 32, 4)


class TestDetectionLayer:
    def test_basic_contract(self):
        p = 24
        c = 4
        rng = np.random.RandomState(3)
        proposals = np.zeros((1, p, 4), np.float32)
        proposals[0, :8] = make_anchors(8, rng)
        probs = np.full((1, p, c), 0.05, np.float32)
        # roi 0: strong class 2; roi 1: background; roi 2: low score class 1
        probs[0, 0] = [0.02, 0.03, 0.9, 0.05]
        probs[0, 1] = [0.97, 0.01, 0.01, 0.01]
        probs[0, 2] = [0.4, 0.55, 0.03, 0.02]
        deltas = np.zeros((1, p, c, 4), np.float32)
        window = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
        det = np.asarray(
            detection_layer(
                jnp.asarray(proposals), jnp.asarray(probs), jnp.asarray(deltas),
                window, CFG,
            )
        )
        assert det.shape == (1, CFG.detection_post_nms_instances, 6)
        kept = det[0][det[0, :, 5] > 0]
        assert len(kept) == 1
        assert kept[0, 4] == 2  # class id
        assert kept[0, 5] > 0.89
        np.testing.assert_allclose(kept[0, :4], proposals[0, 0], atol=1e-4)

    def test_per_class_nms_keeps_overlapping_different_classes(self):
        p = 8
        c = 4
        proposals = np.zeros((1, p, 4), np.float32)
        proposals[0, 0] = [0.2, 0.2, 0.6, 0.6]
        proposals[0, 1] = [0.21, 0.21, 0.61, 0.61]  # heavy overlap
        probs = np.full((1, p, c), 0.01, np.float32)
        probs[0, 0] = [0.05, 0.9, 0.03, 0.02]  # class 1
        probs[0, 1] = [0.05, 0.02, 0.9, 0.03]  # class 2
        deltas = np.zeros((1, p, c, 4), np.float32)
        det = np.asarray(
            detection_layer(
                jnp.asarray(proposals), jnp.asarray(probs), jnp.asarray(deltas),
                jnp.asarray([[0.0, 0.0, 1.0, 1.0]]), CFG,
            )
        )
        kept = det[0][det[0, :, 5] > 0]
        assert len(kept) == 2  # both survive: different classes
        assert set(kept[:, 4]) == {1.0, 2.0}

    def test_same_class_overlap_suppressed(self):
        p = 8
        c = 4
        proposals = np.zeros((1, p, 4), np.float32)
        proposals[0, 0] = [0.2, 0.2, 0.6, 0.6]
        proposals[0, 1] = [0.21, 0.21, 0.61, 0.61]
        probs = np.full((1, p, c), 0.01, np.float32)
        probs[0, 0] = [0.05, 0.9, 0.03, 0.02]
        probs[0, 1] = [0.05, 0.85, 0.05, 0.05]  # same class, lower score
        deltas = np.zeros((1, p, c, 4), np.float32)
        det = np.asarray(
            detection_layer(
                jnp.asarray(proposals), jnp.asarray(probs), jnp.asarray(deltas),
                jnp.asarray([[0.0, 0.0, 1.0, 1.0]]), CFG,
            )
        )
        kept = det[0][det[0, :, 5] > 0]
        assert len(kept) == 1
        assert abs(kept[0, 5] - 0.9) < 1e-5


class TestRPNTargets:
    def test_matching_rules(self):
        # anchors: one perfectly on the GT, one far away, one partial
        anchors = jnp.asarray(
            [
                [0.2, 0.2, 0.4, 0.4],  # == gt: IoU 1 → positive
                [0.7, 0.7, 0.9, 0.9],  # IoU 0 → negative
                [0.25, 0.25, 0.45, 0.45],  # IoU ~0.47 → neutral (but not best)
            ]
        )
        gt = jnp.asarray([[0.2, 0.2, 0.4, 0.4], [0, 0, 0, 0]])
        out = rpn_targets(
            anchors, gt, jnp.asarray([True, False]), CFG, jax.random.PRNGKey(0)
        )
        tc = np.asarray(out.target_class)
        assert tc[0] == 1
        assert tc[1] == -1
        assert tc[2] == 0
        # positive delta row 0 should be ~0 (perfect match)
        np.testing.assert_allclose(
            np.asarray(out.target_deltas)[0], 0.0, atol=1e-5
        )
        assert int(out.num_positives) == 1

    def test_best_anchor_forced_positive_below_07(self):
        anchors = jnp.asarray(
            [[0.2, 0.2, 0.45, 0.45], [0.6, 0.6, 0.9, 0.9]]
        )
        gt = jnp.asarray([[0.2, 0.2, 0.4, 0.4]])
        out = rpn_targets(
            anchors, gt, jnp.asarray([True]), CFG, jax.random.PRNGKey(0)
        )
        # anchor 0 has IoU ~0.6 (<0.7) but is the best for the GT → positive
        assert int(out.target_class[0]) == 1

    def test_balancing_caps_positives(self):
        rng = np.random.RandomState(4)
        # 40 anchors all == gt → all would be positive; budget is 16 → ≤8
        gt_box = np.array([0.3, 0.3, 0.6, 0.6], np.float32)
        anchors = jnp.asarray(np.tile(gt_box, (40, 1)))
        gt = jnp.asarray(gt_box[None])
        out = rpn_targets(
            anchors, gt, jnp.asarray([True]), CFG, jax.random.PRNGKey(1)
        )
        assert int(jnp.sum(out.target_class == 1)) == CFG.rpn_train_anchors_per_image // 2

    def test_no_gt_no_positives(self):
        anchors = jnp.asarray(make_anchors(20, np.random.RandomState(5)))
        gt = jnp.zeros((3, 4))
        out = rpn_targets(
            anchors, gt, jnp.zeros(3, bool), CFG, jax.random.PRNGKey(0)
        )
        assert int(jnp.sum(out.target_class == 1)) == 0


class TestDetectionTargets:
    def test_positive_assignment_and_deltas(self):
        proposals = jnp.asarray(
            [
                [0.2, 0.2, 0.4, 0.4],  # IoU 1 with gt 0 → positive
                [0.21, 0.21, 0.41, 0.41],  # high IoU with gt 0 → positive
                [0.7, 0.7, 0.9, 0.9],  # no overlap → negative
                [0.0, 0.0, 0.0, 0.0],  # padding
            ]
        )
        gt = jnp.asarray([[0.2, 0.2, 0.4, 0.4], [0, 0, 0, 0]])
        gt_ids = jnp.asarray([2, 0], jnp.int32)
        out = detection_targets(
            proposals, gt, gt_ids, CFG, jax.random.PRNGKey(0)
        )
        assert out.rois.shape == (CFG.train_rois_per_image, 4)
        n_pos = int(jnp.sum(out.pos_mask))
        assert n_pos == 2
        # positives packed first with class 2
        ids = np.asarray(out.target_class_ids)
        assert (ids[:n_pos] == 2).all()
        assert (ids[n_pos:] == 0).all()
        # deltas of the exact-match positive are 0
        d = np.asarray(out.target_deltas)
        exact_row = np.where(
            np.abs(np.asarray(out.rois) - np.array([0.2, 0.2, 0.4, 0.4])).sum(1)
            < 1e-6
        )[0][0]
        np.testing.assert_allclose(d[exact_row], 0.0, atol=1e-5)

    def test_padding_rows_not_sampled(self):
        proposals = jnp.zeros((8, 4))
        gt = jnp.asarray([[0.2, 0.2, 0.4, 0.4]])
        gt_ids = jnp.asarray([1], jnp.int32)
        out = detection_targets(
            proposals, gt, gt_ids, CFG, jax.random.PRNGKey(0)
        )
        assert int(jnp.sum(out.valid_mask)) == 0

    def test_mask_targets_crop(self):
        # GT mask: a filled square matching the gt box exactly → target mask ≈ 1
        h = w = 32
        mask = np.zeros((1, h, w), np.float32)
        mask[0, 8:16, 8:16] = 1.0
        gt = jnp.asarray([[8 / 31, 8 / 31, 15 / 31, 15 / 31]])
        proposals = jnp.concatenate([gt, jnp.zeros((5, 4))], axis=0)
        out = detection_targets(
            proposals,
            gt,
            jnp.asarray([1], jnp.int32),
            CFG,
            jax.random.PRNGKey(0),
            gt_masks=jnp.asarray(mask),
        )
        pos_row = int(np.argmax(np.asarray(out.pos_mask)))
        tm = np.asarray(out.target_masks)[pos_row]
        assert tm.mean() > 0.9


class TestMiniMaskTargets:
    def test_mini_and_full_mask_targets_agree(self):
        """Mask targets computed from mini-masks must match full-frame ones."""
        import cv2

        h = w = 64
        # gt: a filled ellipse-ish blob inside its box
        full = np.zeros((1, h, w), np.float32)
        full[0, 16:40, 20:48] = 1.0
        full[0, 16:20, 20:26] = 0.0  # notch for structure
        gt = jnp.asarray([[16 / 63, 20 / 63, 39 / 63, 47 / 63]])
        gt_ids = jnp.asarray([1], jnp.int32)
        # mini-mask: crop the gt box region, resize to 56²
        y1, x1, y2, x2 = 16, 20, 40, 48
        mini = cv2.resize(full[0, y1:y2, x1:x2], (56, 56), interpolation=cv2.INTER_LINEAR)

        cfg = CFG.replace(use_mini_mask=True, mini_mask_shape=(56, 56))
        proposals = jnp.concatenate(
            [gt + jnp.asarray([[0.02, 0.01, -0.01, -0.02]]), jnp.zeros((5, 4))],
            axis=0,
        )
        key = jax.random.PRNGKey(0)
        out_full = detection_targets(
            proposals, gt, gt_ids, cfg, key, gt_masks=jnp.asarray(full)
        )
        out_mini = detection_targets(
            proposals, gt, gt_ids, cfg, key,
            gt_masks=jnp.asarray(mini[None]), masks_are_mini=True,
        )
        pos = int(np.argmax(np.asarray(out_full.pos_mask)))
        a = np.asarray(out_full.target_masks)[pos]
        b = np.asarray(out_mini.target_masks)[pos]
        # same binary pattern within a small disagreement band
        assert np.mean(a != b) < 0.06, np.mean(a != b)
