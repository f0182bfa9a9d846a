"""Evaluator tests with analytically known AP values."""

import numpy as np

from objectdetection_tpu.evaluate import DetectionEvaluator, average_precision
from objectdetection_tpu import metrics


class TestAveragePrecision:
    def test_perfect(self):
        assert average_precision(np.array([1.0]), np.array([1.0])) == 1.0

    def test_half_precision(self):
        # recall reaches 1.0 with precision 0.5 throughout
        r = np.array([0.5, 1.0])
        p = np.array([0.5, 0.5])
        assert abs(average_precision(r, p) - 0.5) < 1e-6


class TestEvaluator:
    def test_perfect_detection(self):
        ev = DetectionEvaluator(num_classes=3)
        gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
        ev.add_image(gt, [1, 2], [0.9, 0.8], gt, [1, 2])
        res = ev.evaluate()
        assert res["mAP"] == 1.0
        assert res["AP50"] == 1.0

    def test_miss_halves_recall(self):
        ev = DetectionEvaluator(num_classes=2)
        gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
        ev.add_image(gt[:1], [1], [0.9], gt, [1, 1])
        res = ev.evaluate()
        assert abs(res["mAP"] - 0.5) < 1e-6

    def test_false_positive_hurts_precision(self):
        ev = DetectionEvaluator(num_classes=2)
        gt = np.array([[0, 0, 10, 10]], np.float32)
        preds = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
        # FP scored higher than the TP
        ev.add_image(preds, [1, 1], [0.5, 0.9], gt, [1])
        res = ev.evaluate()
        assert abs(res["mAP"] - 0.5) < 1e-6

    def test_localization_threshold(self):
        ev = DetectionEvaluator(num_classes=2, iou_thresholds=[0.5, 0.9])
        gt = np.array([[0, 0, 10, 10]], np.float32)
        pred = np.array([[0, 0, 10, 8.0]])  # IoU 0.8
        ev.add_image(pred, [1], [0.9], gt, [1])
        res = ev.evaluate()
        assert abs(res["mAP"] - 0.5) < 1e-6  # passes @0.5, fails @0.9

    def test_wrong_class_no_credit(self):
        ev = DetectionEvaluator(num_classes=3)
        gt = np.array([[0, 0, 10, 10]], np.float32)
        ev.add_image(gt, [2], [0.9], gt, [1])
        assert ev.evaluate()["mAP"] == 0.0

    def test_duplicate_detection_counts_once(self):
        ev = DetectionEvaluator(num_classes=2)
        gt = np.array([[0, 0, 10, 10]], np.float32)
        preds = np.tile(gt, (2, 1))
        ev.add_image(preds, [1, 1], [0.9, 0.8], gt, [1])
        res = ev.evaluate()
        # 1 TP + 1 FP at lower score: AP = 1.0 (TP first)
        assert res["mAP"] == 1.0


class TestCrowdIgnore:
    def test_detection_in_crowd_not_fp(self):
        ev = DetectionEvaluator(num_classes=2)
        gt = np.array([[0, 0, 10, 10]], np.float32)
        # second detection lies inside a crowd region, scored higher than the TP
        preds = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
        crowd = np.array([[45, 45, 70, 70]], np.float32)
        ev.add_image(
            preds, [1, 1], [0.5, 0.9], gt, [1],
            ignore_boxes=crowd, ignore_classes=[1],
        )
        assert ev.evaluate()["mAP"] == 1.0  # crowd hit ignored, TP clean

    def test_crowd_of_other_class_still_fp(self):
        ev = DetectionEvaluator(num_classes=3)
        gt = np.array([[0, 0, 10, 10]], np.float32)
        preds = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
        crowd = np.array([[45, 45, 70, 70]], np.float32)
        ev.add_image(
            preds, [1, 1], [0.5, 0.9], gt, [1],
            ignore_boxes=crowd, ignore_classes=[2],  # different class
        )
        assert abs(ev.evaluate()["mAP"] - 0.5) < 1e-6


class TestMaskMAP:
    def _mask(self, h, w, y1, x1, y2, x2):
        m = np.zeros((h, w), bool)
        m[y1:y2, x1:x2] = True
        return m

    def test_perfect_masks(self):
        ev = DetectionEvaluator(num_classes=2, use_masks=True)
        gt_boxes = np.array([[2, 2, 10, 10]], np.float32)
        m = self._mask(16, 16, 2, 2, 10, 10)[None]
        ev.add_image(gt_boxes, [1], [0.9], gt_boxes, [1],
                     pred_masks=m, gt_masks=m)
        assert ev.evaluate()["mAP"] == 1.0

    def test_boxes_match_but_masks_dont(self):
        # same box, disjoint masks → box AP would be 1, mask AP must be 0
        ev = DetectionEvaluator(num_classes=2, use_masks=True)
        gt_boxes = np.array([[0, 0, 16, 16]], np.float32)
        pm = self._mask(16, 16, 0, 0, 16, 8)[None]
        gm = self._mask(16, 16, 0, 8, 16, 16)[None]
        ev.add_image(gt_boxes, [1], [0.9], gt_boxes, [1],
                     pred_masks=pm, gt_masks=gm)
        assert ev.evaluate()["mAP"] == 0.0

    def test_partial_overlap_threshold(self):
        ev = DetectionEvaluator(
            num_classes=2, use_masks=True, iou_thresholds=[0.5, 0.9]
        )
        gt_boxes = np.array([[0, 0, 16, 16]], np.float32)
        pm = self._mask(16, 16, 0, 0, 16, 12)[None]  # IoU 12/16 = 0.75
        gm = self._mask(16, 16, 0, 0, 16, 16)[None]
        ev.add_image(gt_boxes, [1], [0.9], gt_boxes, [1],
                     pred_masks=pm, gt_masks=gm)
        assert abs(ev.evaluate()["mAP"] - 0.5) < 1e-6


class TestMetrics:
    def test_step_timer(self):
        t = metrics.StepTimer()
        for _ in range(3):
            with t:
                pass
        assert t.compile_time is not None
        assert len(t.step_times) == 2

    def test_logger(self, tmp_path):
        path = str(tmp_path / "m.jsonl")
        lg = metrics.MetricLogger(path)
        lg.log(0, loss=1.5)
        lg.log(1, loss=1.2)
        assert lg.latest()["loss"] == 1.2
        assert len(open(path).readlines()) == 2

    def test_debug_checks_noop_when_off(self):
        import jax.numpy as jnp

        metrics.enable_debug_checks(False)
        x = jnp.asarray([1.0, float("nan")])
        out = metrics.check_finite(x, "x")
        assert out is x

    def test_profiler_trace_writes_files(self, tmp_path):
        import os

        import jax
        import jax.numpy as jnp

        with metrics.trace(str(tmp_path)):
            y = jax.jit(lambda a: a * 2)(jnp.ones((8, 8)))
            jax.block_until_ready(y)
        found = []
        for root, _, files in os.walk(tmp_path):
            found.extend(files)
        assert any(f.endswith(".pb") or "trace" in f for f in found), found

    def test_debug_checks_on_run_under_jit(self):
        import jax
        import jax.numpy as jnp

        metrics.enable_debug_checks(True)
        try:
            f = jax.jit(lambda x: metrics.check_boxes(x, "b"))
            out = f(jnp.asarray([[0.1, 0.1, 0.5, 0.5]]))
            assert out.shape == (1, 4)
        finally:
            metrics.enable_debug_checks(False)
