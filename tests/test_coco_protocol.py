"""COCO-protocol evaluator tests: rigged scenes with hand-computable
AP/AR under the pycocotools semantics (area ranges, maxDets, 101-pt
interpolation, ignore handling).  pycocotools itself is not installed
(SURVEY.md §7), so the oracle is arithmetic, not a library."""

import numpy as np

from scda_tpu.data.voc import Dataset, ImageRecord
from scda_tpu.evals.coco_protocol import evaluate_coco_protocol


def _rec(image_id, boxes, labels, difficult=None, wh=(200, 200)):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    labels = np.asarray(labels, np.int32)
    if difficult is None:
        difficult = np.zeros(len(labels), bool)
    return ImageRecord(
        image_id=image_id, image_path="", width=wh[0], height=wh[1],
        boxes=boxes, labels=labels, difficult=np.asarray(difficult, bool),
    )


def _ds(records, classes=("thing",)):
    return Dataset(name="rig", classes=classes, records=records)


class TestCocoProtocol:
    def test_perfect_detections(self):
        ds = _ds([
            _rec("a", [[10, 10, 60, 60]], [1]),
            _rec("b", [[20, 20, 150, 150]], [1]),
        ])
        dets = {"thing": [
            ("a", np.array([10, 10, 60, 60.0]), 0.9),
            ("b", np.array([20, 20, 150, 150.0]), 0.8),
        ]}
        r = evaluate_coco_protocol(ds, dets)
        assert r["AP"] == 1.0
        assert r["AP50"] == 1.0 and r["AP75"] == 1.0
        assert r["AR@100"] == 1.0 and r["AR@1"] == 1.0

    def test_iou_quality_gates_thresholds(self):
        # gt area 100x100; det IoU exactly 0.75 -> passes thresholds
        # .50..75 inclusive = 6 of 10 -> AP = 0.6, AP50 = 1, AP75 = 1,
        # and at .80 it fails.
        ds = _ds([_rec("a", [[0, 0, 100, 100]], [1])])
        dets = {"thing": [("a", np.array([0, 25.0, 100, 100]), 0.9)]}
        r = evaluate_coco_protocol(ds, dets)
        assert abs(r["AP50"] - 1.0) < 1e-9
        assert abs(r["AP75"] - 1.0) < 1e-9
        assert abs(r["AP"] - 0.6) < 1e-9

    def test_area_ranges(self):
        # One small gt (16x16 = 256 < 32^2) detected perfectly, one
        # large gt (120x120 > 96^2) missed entirely.
        ds = _ds([_rec("a", [[0, 0, 16, 16], [30, 30, 150, 150]], [1, 1])])
        dets = {"thing": [("a", np.array([0, 0, 16.0, 16]), 0.9)]}
        r = evaluate_coco_protocol(ds, dets)
        assert r["AP_small"] == 1.0
        assert r["AP_large"] == 0.0
        assert r["AR_small"] == 1.0 and r["AR_large"] == 0.0
        # medium: no gt anywhere -> pycocotools' -1 sentinel, distinct
        # from a genuinely-zero AP (ADVICE r3)
        assert r["AP_medium"] == -1.0
        assert r["AR_medium"] == -1.0
        # area=all sees 1 of 2 found at perfect precision: AP ~ 0.5
        assert abs(r["AP"] - 0.5) < 0.01

    def test_max_dets_caps_recall(self):
        # 12 high-scoring decoys + 1 correct low-scoring det: with
        # maxDets=10 the correct det is cut, with 100 it survives.
        gt = [[50, 50, 100, 100]]
        dets = [("a", np.array([150.0, 150, 160, 160]) + i, 0.9 - 0.01 * i)
                for i in range(12)]
        dets.append(("a", np.array([50, 50, 100, 100.0]), 0.1))
        ds = _ds([_rec("a", gt, [1])])
        r = evaluate_coco_protocol(ds, {"thing": dets})
        assert r["AR@10"] == 0.0
        assert r["AR@100"] == 1.0
        assert r["AR@1"] == 0.0

    def test_difficult_gt_is_ignored_not_fp(self):
        # A det matching a difficult gt must be ignored (not FP), so
        # the remaining perfect det keeps AP at 1.
        ds = _ds([_rec("a", [[0, 0, 50, 50], [100, 100, 150, 150]],
                       [1, 1], difficult=[False, True])])
        dets = {"thing": [
            ("a", np.array([100, 100, 150, 150.0]), 0.95),  # difficult
            ("a", np.array([0, 0, 50, 50.0]), 0.9),
        ]}
        r = evaluate_coco_protocol(ds, dets)
        assert r["AP"] == 1.0
        assert r["AR@100"] == 1.0  # npos counts only the non-difficult

    def test_duplicate_det_on_difficult_gt_is_fp(self):
        """pycocotools exempts only CROWD gts from the taken check; a
        difficult (ignored, non-crowd) gt matches at most once, so a
        second det on it is a genuine FP (r3 review: it used to be
        ignored, inflating AP to 1.0 where pycocotools gives ~0.5)."""
        ds = _ds([_rec("a", [[0, 0, 50, 50], [100, 100, 150, 150]],
                       [1, 1], difficult=[False, True])])
        dets = {"thing": [
            ("a", np.array([100, 100, 150, 150.0]), 0.95),  # ignored
            ("a", np.array([100, 100, 150, 150.0]), 0.93),  # FP!
            ("a", np.array([0, 0, 50, 50.0]), 0.9),
        ]}
        r = evaluate_coco_protocol(ds, dets)
        # Envelope precision at the single achieved recall point: the
        # TP ranks below one FP -> precision 0.5 at recall 1.
        assert abs(r["AP50"] - 0.5) < 1e-6

    def test_class_without_gt_excluded_from_mean(self):
        ds = _ds([_rec("a", [[0, 0, 50, 50]], [1])],
                 classes=("thing", "ghost"))
        dets = {"thing": [("a", np.array([0, 0, 50, 50.0]), 0.9)]}
        r = evaluate_coco_protocol(ds, dets)
        # ghost has no gt anywhere: mean over classes = thing only.
        assert r["AP"] == 1.0

    def test_false_positive_halves_precision_tail(self):
        # One gt, one perfect det + one higher-scoring FP: precision
        # envelope is 0.5 at every achieved recall -> AP 0.5.
        ds = _ds([_rec("a", [[0, 0, 50, 50]], [1])])
        dets = {"thing": [
            ("a", np.array([120, 120, 160, 160.0]), 0.95),
            ("a", np.array([0, 0, 50, 50.0]), 0.9),
        ]}
        r = evaluate_coco_protocol(ds, dets)
        assert abs(r["AP"] - 0.5) < 1e-6


def _rec_crowd(image_id, boxes, labels, crowd, wh=(200, 200)):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    labels = np.asarray(labels, np.int32)
    crowd = np.asarray(crowd, bool)
    return ImageRecord(
        image_id=image_id, image_path="", width=wh[0], height=wh[1],
        boxes=boxes, labels=labels, difficult=crowd.copy(),
        iscrowd=crowd,
    )


class TestCrowdSemantics:
    """pycocotools iscrowd handling: crowd-IoU (intersection/det-area)
    and rematch-allowed (a crowd absorbs any number of dets)."""

    def test_det_inside_crowd_is_ignored_not_fp(self):
        # A small det fully inside a big crowd region has tiny
        # box-IoU (~0.01) but crowd-IoU 1.0 -> ignored, so the
        # remaining perfect det keeps AP at 1.
        ds = _ds([_rec_crowd("a",
                             [[0, 0, 50, 50], [100, 100, 199, 199]],
                             [1, 1], [False, True])])
        dets = {"thing": [
            ("a", np.array([140, 140, 150, 150.0]), 0.95),  # in crowd
            ("a", np.array([0, 0, 50, 50.0]), 0.9),
        ]}
        r = evaluate_coco_protocol(ds, dets)
        assert r["AP"] == 1.0

    def test_crowd_absorbs_multiple_dets(self):
        # TWO dets inside the crowd: both ignored (rematch allowed) —
        # with the matched-once rule the second would be an FP and AP
        # would drop to ~0.5.
        ds = _ds([_rec_crowd("a",
                             [[0, 0, 50, 50], [100, 100, 199, 199]],
                             [1, 1], [False, True])])
        dets = {"thing": [
            ("a", np.array([110, 110, 130, 130.0]), 0.95),
            ("a", np.array([150, 150, 180, 180.0]), 0.93),
            ("a", np.array([0, 0, 50, 50.0]), 0.9),
        ]}
        r = evaluate_coco_protocol(ds, dets)
        assert r["AP"] == 1.0

    def test_crowd_excluded_from_npos(self):
        # Crowd gt contributes no recall mass: a single perfect det on
        # the real gt reaches AR 1.0 even though the crowd is unmatched.
        ds = _ds([_rec_crowd("a",
                             [[0, 0, 50, 50], [100, 100, 199, 199]],
                             [1, 1], [False, True])])
        dets = {"thing": [("a", np.array([0, 0, 50, 50.0]), 0.9)]}
        r = evaluate_coco_protocol(ds, dets)
        assert r["AR@100"] == 1.0

    def test_det_outside_crowd_still_fp(self):
        # Crowd handling must not launder genuine false positives.
        ds = _ds([_rec_crowd("a",
                             [[0, 0, 50, 50], [100, 100, 199, 199]],
                             [1, 1], [False, True])])
        dets = {"thing": [
            ("a", np.array([60, 60, 90, 90.0]), 0.95),  # overlaps nothing
            ("a", np.array([0, 0, 50, 50.0]), 0.9),
        ]}
        r = evaluate_coco_protocol(ds, dets)
        assert abs(r["AP50"] - 0.5) < 1e-6

    def test_non_crowd_gt_still_matched_once(self):
        # Crowd exemption must not leak to ordinary gts: duplicate det
        # on a real gt remains an FP.
        ds = _ds([_rec_crowd("a", [[0, 0, 50, 50]], [1], [False])])
        dets = {"thing": [
            ("a", np.array([0, 0, 50, 50.0]), 0.95),
            ("a", np.array([0, 0, 50, 50.0]), 0.9),  # duplicate -> FP
        ]}
        r = evaluate_coco_protocol(ds, dets)
        assert abs(r["AP50"] - 1.0) < 1e-6  # envelope: TP first
        # precision tail 0.5 shows the FP counted
        assert abs(r["AR@100"] - 1.0) < 1e-6


class TestBatchedMatcherEquivalence:
    def test_batched_matches_scalar_oracle(self):
        """_match_image_batched must reproduce the readable per-(area,
        thr) _match_image scan exactly on adversarial random inputs
        (kept as the semantic oracle after the 8x vectorization)."""
        from scda_tpu.evals.coco_protocol import (
            _match_image, _match_image_batched,
        )

        rng = np.random.RandomState(7)
        thrs = np.asarray([0.3, 0.5, 0.75, 0.9])
        for _ in range(30):
            d = rng.randint(0, 12)
            g = rng.randint(0, 9)
            # Quantized IoUs make exact ties and threshold hits common.
            ious = rng.randint(0, 11, (d, g)) / 10.0
            a = rng.randint(1, 4)
            g_ig = rng.rand(a, g) < 0.4
            # Crowds are always ignored gts (mirrors the evaluator:
            # difficult is set for every crowd).
            crowd = (rng.rand(g) < 0.3) & (g_ig.all(axis=0))
            g_ig = g_ig | crowd[None, :]
            bm, big = _match_image_batched(ious, g_ig, thrs, crowd)
            for ai in range(a):
                for ti, thr in enumerate(thrs):
                    m, ig = _match_image(ious, g_ig[ai], float(thr),
                                         crowd)
                    np.testing.assert_array_equal(bm[ai, ti], m)
                    np.testing.assert_array_equal(big[ai, ti], ig)
