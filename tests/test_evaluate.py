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


class TestIndependentCrossCheck:
    """A from-scratch second implementation of score-ranked greedy-matching
    AP (structured completely differently: per-threshold confusion counts
    swept over every distinct score, envelope integration by scanning) must
    agree with DetectionEvaluator on randomized inputs. Guards the headline
    training/int8 mAP claims against evaluator bugs (pycocotools is not
    installed here; this is the cross-implementation check in its place)."""

    @staticmethod
    def _iou(a, b):
        y1 = max(a[0], b[0]); x1 = max(a[1], b[1])
        y2 = min(a[2], b[2]); x2 = min(a[3], b[3])
        inter = max(y2 - y1, 0.0) * max(x2 - x1, 0.0)
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1])
        return inter / (ua - inter) if ua - inter > 0 else 0.0

    def _reference_map(self, images, num_classes, iou_t):
        """Per class: global score-ordered greedy matching (each det takes
        the highest-IoU unused same-image GT if >= iou_t), then AP as the
        exact area under the best-precision-at-recall>=r envelope evaluated
        at every prefix of the ranked detection list."""
        aps = []
        for cls in range(1, num_classes):
            dets = []  # (score, img_idx, box)
            n_gt = 0
            for ii, img in enumerate(images):
                for b, c, s in zip(*img["pred"]):
                    if c == cls:
                        dets.append((s, ii, b))
                n_gt += sum(1 for c in img["gt"][1] if c == cls)
            if n_gt == 0:
                continue
            dets.sort(key=lambda t: -t[0])
            used = {ii: set() for ii in range(len(images))}
            tp_flags = []
            for s, ii, b in dets:
                gtb, gtc = images[ii]["gt"]
                best_j, best_iou = -1, 0.0
                for j, (gb, gc) in enumerate(zip(gtb, gtc)):
                    if gc != cls or j in used[ii]:
                        continue
                    iou = self._iou(b, gb)
                    if iou > best_iou:
                        best_iou, best_j = iou, j
                if best_j >= 0 and best_iou >= iou_t:
                    used[ii].add(best_j)
                    tp_flags.append(1)
                else:
                    tp_flags.append(0)
            # PR points at every prefix; AP = sum over distinct recall
            # steps of (delta recall) * max precision at recall >= r
            pts = []
            tp = fp = 0
            for f in tp_flags:
                tp += f
                fp += 1 - f
                pts.append((tp / n_gt, tp / (tp + fp)))
            ap = 0.0
            prev_r = 0.0
            for r, _ in sorted(set(pts)):
                if r <= prev_r:
                    continue
                pmax = max(p2 for r2, p2 in pts if r2 >= r)
                ap += (r - prev_r) * pmax
                prev_r = r
            aps.append(ap)
        return float(np.mean(aps)) if aps else 0.0

    def test_randomized_agreement(self):
        rng = np.random.RandomState(0)
        for trial in range(8):
            num_classes = 4
            images = []
            ev = DetectionEvaluator(num_classes, iou_thresholds=(0.5,))
            for _ in range(3):
                g = rng.randint(1, 5)
                gb = np.sort(rng.rand(g, 2, 2), axis=1).transpose(0, 2, 1)
                gb = gb.reshape(g, 4)[:, [0, 2, 1, 3]]  # y1,x1,y2,x2 valid
                gc = rng.randint(1, num_classes, g)
                # predictions: jittered copies of GT (varying IoU) + noise
                pb, pc, ps = [], [], []
                for j in range(g):
                    if rng.rand() < 0.8:
                        jit = rng.randn(4) * rng.choice([0.0, 0.02, 0.1])
                        pb.append(np.clip(gb[j] + jit, 0, 1))
                        pc.append(gc[j] if rng.rand() < 0.85
                                  else rng.randint(1, num_classes))
                        ps.append(rng.rand())
                for _ in range(rng.randint(0, 4)):  # spurious
                    bb = np.sort(rng.rand(2, 2), axis=0).T.reshape(4)
                    pb.append(bb[[0, 2, 1, 3]])
                    pc.append(rng.randint(1, num_classes))
                    ps.append(rng.rand())
                pb = np.asarray(pb, np.float32).reshape(-1, 4)
                pc = np.asarray(pc, np.int32)
                ps = np.asarray(ps, np.float32)
                ev.add_image(pb, pc, ps, gb, gc)
                images.append({"pred": (pb, pc, ps), "gt": (gb, gc)})
            got = ev.evaluate()["mAP"]
            want = self._reference_map(images, num_classes, 0.5)
            assert abs(got - want) < 1e-9, (
                f"trial {trial}: evaluator {got} vs independent {want}"
            )


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
