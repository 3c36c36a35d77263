"""PQ evaluator tests (reference surface: datasets/panoptic_eval.py wrapping
panopticapi.pq_compute; hand-computed expectations follow the published PQ
definition)."""

import numpy as np

from datr_tpu.eval.panoptic_eval import PanopticEvaluator


def _canvas(segs, h=20, w=20):
    m = np.zeros((h, w), np.int32)
    for sid, (y0, y1, x0, x1) in segs.items():
        m[y0:y1, x0:x1] = sid
    return m


def test_perfect_prediction():
    gt = _canvas({1: (0, 10, 0, 10), 2: (10, 20, 10, 20)})
    ev = PanopticEvaluator()
    ev.add_image(gt, {1: 7, 2: 8}, gt, {1: 7, 2: 8})
    s = ev.summarize()
    assert s["PQ"] == s["SQ"] == s["RQ"] == 1.0
    assert s["n"] == 2


def test_partial_overlap_counts_iou():
    # pred shifted 2 cols: overlap 80; the 20 px of pred over GT void are
    # excluded from the union (panopticapi) -> union 100, IoU 0.8 = TP
    gt = _canvas({1: (0, 10, 0, 10)})
    pred = _canvas({5: (0, 10, 2, 12)})
    ev = PanopticEvaluator()
    ev.add_image(pred, {5: 7}, gt, {1: 7})
    s = ev.summarize()
    np.testing.assert_allclose(s["SQ"], 0.8)
    np.testing.assert_allclose(s["PQ"], 0.8)  # TP=1, no FP/FN
    assert s["RQ"] == 1.0


def test_low_iou_is_fn_and_void_absorbs_fp():
    # overlap 40, void-excluded union 100 -> IoU 0.4 < 0.5: FN; the pred is
    # 60% over void, so panopticapi drops it from FP
    gt = _canvas({1: (0, 10, 0, 10)})
    pred = _canvas({5: (0, 10, 6, 16)})
    ev = PanopticEvaluator()
    ev.add_image(pred, {5: 7}, gt, {1: 7})
    s = ev.summarize()
    assert ev.fn[7] == 1 and ev.fp[7] == 0 and ev.tp[7] == 0
    assert s["PQ"] == 0.0


def test_real_fp_not_void_absorbed():
    # pred majority on labeled-but-unmatched area: IoU 30/100 no match, and
    # only 10% void -> counts as FP
    gt = _canvas({1: (0, 10, 0, 10)}, h=10, w=20)
    pred = _canvas({5: (0, 10, 7, 17)}, h=10, w=20)
    gt[0:10, 10:17] = 2  # different-class segment under most of the pred
    ev = PanopticEvaluator()
    ev.add_image(pred, {5: 7}, gt, {1: 7, 2: 9})
    assert ev.fp[7] == 1 and ev.fn[7] == 1


def test_category_mismatch_never_matches():
    gt = _canvas({1: (0, 10, 0, 10)})
    ev = PanopticEvaluator()
    ev.add_image(gt, {1: 9}, gt, {1: 7})
    assert ev.tp[7] == 0 and ev.fn[7] == 1 and ev.fp[9] == 1


def test_crowd_gt_not_fn_and_absorbs_pred():
    # crowd GT: never matched, not FN; a pred mostly inside same-class
    # crowd is not FP either
    gt = _canvas({3: (0, 20, 0, 20)})
    pred = _canvas({5: (0, 10, 0, 10)})
    ev = PanopticEvaluator()
    ev.add_image(pred, {5: 7}, gt, {3: 7}, gt_iscrowd={3: True})
    assert ev.fn[7] == 0 and ev.fp[7] == 0 and ev.tp[7] == 0
    # different class pred over the crowd IS a FP
    ev2 = PanopticEvaluator()
    ev2.add_image(pred, {5: 9}, gt, {3: 7}, gt_iscrowd={3: True})
    assert ev2.fp[9] == 1


def test_void_majority_pred_ignored():
    # pred 60% over void -> not FP
    gt = _canvas({1: (0, 20, 0, 4)})  # rest void
    pred = _canvas({5: (0, 20, 2, 12)})  # 2 cols on gt, 8 on void
    ev = PanopticEvaluator()
    ev.add_image(pred, {5: 7}, gt, {1: 7})
    assert ev.fp[7] == 0 and ev.fn[7] == 1


def test_void_excluded_from_union():
    # gt segment 10x10; pred covers 10x10 exactly but 10x2 of the pred also
    # hangs over void — union excludes the void overlap
    gt = _canvas({1: (0, 10, 0, 10)})
    pred = _canvas({5: (0, 10, 0, 12)})
    ev = PanopticEvaluator()
    ev.add_image(pred, {5: 7}, gt, {1: 7})
    np.testing.assert_allclose(ev.iou_sum[7], 100 / (100 + 120 - 100 - 20))


def test_merge_across_processes():
    gt = _canvas({1: (0, 10, 0, 10)})
    a, b = PanopticEvaluator(), PanopticEvaluator()
    a.add_image(gt, {1: 7}, gt, {1: 7})
    b.add_image(_canvas({5: (0, 10, 6, 16)}), {5: 7}, gt, {1: 7})
    a.merge([b])
    s = a.summarize()
    # TP=1 (iou 1.0), FN=1 (b's pred is void-absorbed, not FP)
    # -> PQ = 1 / (1 + 0.5) = 2/3
    np.testing.assert_allclose(s["PQ"], 2 / 3)
    np.testing.assert_allclose(s["SQ"], 1.0)
