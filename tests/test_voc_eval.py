"""Unit tests for the VOC AP evaluator — protocol parity semantics.

The reference's voc_eval.py encodes several subtle rules (greedy
match by score order, each gt matched once, difficult boxes neither
positive nor FP, 11-point vs AUC AP); these pin them with hand-computed
golden values.
"""

import numpy as np

from scda_tpu.evals.voc_eval import (ClassEval, _iou_one_to_many,
                                     eval_class, voc_ap)


class TestVocAp:
    def test_perfect_detector_auc(self):
        rec = np.array([0.5, 1.0])
        prec = np.array([1.0, 1.0])
        assert voc_ap(rec, prec) == 1.0

    def test_11pt_vs_auc(self):
        # One TP then one FP over 2 gt: rec=[0.5,0.5], prec=[1.0,0.5].
        rec = np.array([0.5, 0.5])
        prec = np.array([1.0, 0.5])
        # AUC: area = 0.5 * 1.0 = 0.5
        assert abs(voc_ap(rec, prec) - 0.5) < 1e-9
        # 11pt: recall points 0,0.1..0.5 get max prec 1.0 (6 points),
        # the rest 0 -> 6/11.
        assert abs(voc_ap(rec, prec, use_07_metric=True) - 6 / 11) < 1e-9

    def test_precision_envelope(self):
        # Nonmonotonic precision must be enveloped from the right.
        rec = np.array([0.25, 0.5, 0.5, 0.75])
        prec = np.array([1.0, 0.66, 0.5, 0.75])
        # envelope: [1.0, 0.75, 0.75, 0.75]
        expected = 0.25 * 1.0 + 0.25 * 0.75 + 0.25 * 0.75
        assert abs(voc_ap(rec, prec) - expected) < 1e-9


class TestEvalClass:
    def gt(self):
        return {
            "im1": (np.array([[0.0, 0, 10, 10], [20, 20, 30, 30]]),
                    np.array([False, False])),
            "im2": (np.array([[5.0, 5, 15, 15]]), np.array([False])),
        }

    def test_greedy_match_and_double_match_fp(self):
        # Two detections on the same gt: the higher-scored one matches,
        # the second is a false positive (ref voc_eval.py ~160).
        dets_img = ["im1", "im1"]
        boxes = np.array([[0.0, 0, 10, 10], [1, 1, 10, 10]])
        scores = np.array([0.9, 0.8])
        ce = eval_class(self.gt(), dets_img, boxes, scores)
        assert ce.num_gt == 3
        # TP=1 of 3 gt -> final recall 1/3; precision [1, 0.5].
        assert abs(ce.recall[-1] - 1 / 3) < 1e-9
        assert abs(ce.precision[-1] - 0.5) < 1e-9

    def test_difficult_neither_tp_nor_fp(self):
        gt = {"im1": (np.array([[0.0, 0, 10, 10]]), np.array([True]))}
        ce = eval_class(gt, ["im1"], np.array([[0.0, 0, 10, 10]]),
                        np.array([0.9]))
        assert ce.num_gt == 0  # difficult excluded from npos
        # Matching a difficult gt is ignored entirely: no TP, no FP.
        assert ce.recall[-1] == 0.0
        assert ce.precision[-1] == 0.0  # 0 TP / 1 det... prec=0? tp=0,fp=0
        # With tp=fp=0 precision is 0/eps = 0 -> ap 0 but not an error.
        assert ce.ap == 0.0

    def test_iou_below_threshold_is_fp(self):
        ce = eval_class(self.gt(), ["im2"],
                        np.array([[50.0, 50, 60, 60]]), np.array([0.9]))
        assert ce.ap == 0.0
        assert ce.precision[-1] == 0.0

    def test_exact_threshold_tie_is_fp(self):
        # Canonical protocol uses strict `ovmax > ovthresh`
        # (ref voc_eval.py:~160): a detection at exactly IoU == 0.5 is
        # a false positive.  Boxes use the +1 convention, so gt
        # [0,0,9,9] (area 100) vs det [0,0,9,4] (area 50, fully inside)
        # has IoU exactly 50/100 = 0.5.
        gt = {"im1": (np.array([[0.0, 0, 9, 9]]), np.array([False]))}
        det = np.array([[0.0, 0, 9, 4]])
        iou = _iou_one_to_many(det[0], gt["im1"][0])
        assert iou[0] == 0.5  # the fixture really is a tie
        ce = eval_class(gt, ["im1"], det, np.array([0.9]), ovthresh=0.5)
        assert ce.ap == 0.0
        assert ce.precision[-1] == 0.0
        # ...and just above the threshold it matches.
        det2 = np.array([[0.0, 0, 9, 5]])  # IoU 60/100 = 0.6
        ce2 = eval_class(gt, ["im1"], det2, np.array([0.9]), ovthresh=0.5)
        assert ce2.ap == 1.0

    def test_unknown_image_is_fp(self):
        ce = eval_class(self.gt(), ["im_unknown"],
                        np.array([[0.0, 0, 10, 10]]), np.array([0.9]))
        assert ce.precision[-1] == 0.0

    def test_perfect_detections(self):
        gt = self.gt()
        dets = [("im1", [0, 0, 10, 10]), ("im1", [20, 20, 30, 30]),
                ("im2", [5, 5, 15, 15])]
        ce = eval_class(
            gt, [d[0] for d in dets],
            np.array([d[1] for d in dets], float),
            np.array([0.9, 0.8, 0.7]),
        )
        assert ce.ap == 1.0
        assert ce.recall[-1] == 1.0


class TestIouSweep:
    def test_perfect_detections_sweep(self):
        import dataclasses

        from scda_tpu.evals.voc_eval import evaluate_detections_iou_sweep

        @dataclasses.dataclass
        class Rec:
            image_id: str
            boxes: np.ndarray
            labels: np.ndarray
            difficult: np.ndarray

        @dataclasses.dataclass
        class DS:
            classes: tuple
            records: list

        rec = Rec("im1", np.array([[0.0, 0, 20, 20]]),
                  np.array([1]), np.array([False]))
        ds = DS(("car",), [rec])
        # Exact box: AP 1.0 at every threshold.
        dets = {"car": [("im1", np.array([0.0, 0, 20, 20]), 0.9)]}
        out = evaluate_detections_iou_sweep(ds, dets)
        assert out["mAP@[.5:.95]"] == 1.0

        # Half-overlapping box: IoU ~0.512 -> counts at 0.5, not at 0.55+.
        dets2 = {"car": [("im1", np.array([0.0, 0, 20, 9.8]), 0.9)]}
        out2 = evaluate_detections_iou_sweep(ds, dets2)
        assert out2["mAP@0.50"] == 1.0
        assert out2["mAP@0.75"] == 0.0
        assert 0.05 < out2["mAP@[.5:.95]"] < 0.25
