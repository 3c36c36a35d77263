"""Sanity tests for the numpy COCO evaluator: perfect predictions -> AP 1.0,
misses lower AP, score ordering matters."""

import numpy as np

from datr_tpu.eval.coco_eval import CocoEvaluator


def _box(x, y, w, h):
    return [x, y, x + w, y + h]


def test_perfect_detection_ap1():
    ev = CocoEvaluator(categories=[1, 2])
    gt = np.array([_box(10, 10, 50, 50), _box(100, 100, 40, 40)], float)
    lab = np.array([1, 2])
    ev.add_image(0, gt, lab, gt, np.array([0.9, 0.8]), lab)
    stats = ev.summarize()
    assert abs(stats[0] - 1.0) < 1e-6  # AP
    assert abs(stats[1] - 1.0) < 1e-6  # AP50


def test_half_detected():
    ev = CocoEvaluator(categories=[1])
    gt = np.array([_box(10, 10, 50, 50), _box(200, 200, 50, 50)], float)
    lab = np.array([1, 1])
    # only the first object detected
    ev.add_image(0, gt, lab, gt[:1], np.array([0.9]), lab[:1])
    stats = ev.summarize()
    assert abs(stats[1] - 0.5) < 0.02  # AP50 ~ 0.5


def test_localization_quality_separates_ap50_ap75():
    ev = CocoEvaluator(categories=[1])
    gt = np.array([_box(0, 0, 100, 100)], float)
    # IoU ~ 0.6 detection: passes 0.5, fails 0.75
    det = np.array([_box(0, 0, 80, 100)], float)  # IoU = 0.8
    det2 = np.array([_box(0, 0, 60, 100)], float)  # IoU = 0.6
    ev.add_image(0, gt, np.array([1]), det2, np.array([0.9]), np.array([1]))
    stats = ev.summarize()
    assert stats[1] > 0.99  # AP50
    assert stats[2] < 0.01  # AP75

    ev2 = CocoEvaluator(categories=[1])
    ev2.add_image(0, gt, np.array([1]), det, np.array([0.9]), np.array([1]))
    s2 = ev2.summarize()
    assert s2[2] > 0.99  # IoU .8 passes AP75


def test_false_positives_reduce_precision():
    ev = CocoEvaluator(categories=[1])
    gt = np.array([_box(10, 10, 50, 50)], float)
    dets = np.array([_box(10, 10, 50, 50), _box(300, 300, 50, 50)], float)
    # FP scored higher than TP
    ev.add_image(0, gt, np.array([1]), dets,
                 np.array([0.5, 0.9]), np.array([1, 1]))
    stats = ev.summarize()
    assert 0.3 < stats[1] < 0.7


def test_crowd_gt_is_ignored():
    ev = CocoEvaluator(categories=[1])
    gt = np.array([_box(10, 10, 50, 50), _box(200, 200, 50, 50)], float)
    crowd = np.array([False, True])
    # detect only the crowd region -> neither TP nor FP
    ev.add_image(0, gt, np.array([1, 1]), gt[1:2], np.array([0.9]),
                 np.array([1]), gt_iscrowd=crowd)
    stats = ev.summarize()
    assert stats[1] < 0.01  # the real GT was missed; crowd det ignored
