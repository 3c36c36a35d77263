"""COCO-style detection mAP evaluation in pure numpy.

Capability match for datasets/coco_eval.py:CocoEvaluator (:22-266), which
wraps pycocotools' COCOeval. pycocotools is not available in this image, so
the full evaluation protocol is implemented here: greedy score-ordered
matching at IoU thresholds 0.50:0.05:0.95, 101-point interpolated precision,
area ranges (all/small/medium/large), maxDets (1/10/100), and the standard
12-number summary — index 1 is AP50, the model-selection metric
(main.py:416-515 keys best checkpoints on coco_eval_bbox[1]).

Distributed merge: the reference pickles+all_gathers per-rank results
(coco_eval.py:58-61, misc.py:96-136); here each host accumulates its shard
and `merge()` concatenates — under jit/SPMD eval the detections already live
on host 0, so the merge is a plain list extend.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
MAX_DETS = (1, 10, 100)


def _iou_xyxy(d: np.ndarray, g: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """[D, G] IoU; for crowd GT the denominator is the detection area
    (pycocotools semantics)."""
    if len(d) == 0 or len(g) == 0:
        return np.zeros((len(d), len(g)))
    dx = np.clip(d[:, 2] - d[:, 0], 0, None)
    dy = np.clip(d[:, 3] - d[:, 1], 0, None)
    gx = np.clip(g[:, 2] - g[:, 0], 0, None)
    gy = np.clip(g[:, 3] - g[:, 1], 0, None)
    da = dx * dy
    ga = gx * gy
    lt = np.maximum(d[:, None, :2], g[None, :, :2])
    rb = np.minimum(d[:, None, 2:], g[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = np.where(iscrowd[None, :], da[:, None],
                     da[:, None] + ga[None, :] - inter)
    return inter / np.clip(union, 1e-12, None)


class CocoEvaluator:
    """Accumulates per-image detections + GT, computes the 12 COCO stats."""

    def __init__(self, categories: Sequence[int]):
        self.categories = sorted(set(int(c) for c in categories))
        self._gt: Dict[int, dict] = {}  # image_id -> gt dict
        self._dt: Dict[int, dict] = {}

    # -- update API -------------------------------------------------------
    def add_image(
        self,
        image_id: int,
        gt_boxes: np.ndarray,  # [G, 4] xyxy absolute
        gt_labels: np.ndarray,  # [G]
        det_boxes: np.ndarray,  # [D, 4] xyxy absolute
        det_scores: np.ndarray,  # [D]
        det_labels: np.ndarray,  # [D]
        gt_iscrowd: np.ndarray | None = None,
    ):
        image_id = int(image_id)
        if gt_iscrowd is None:
            gt_iscrowd = np.zeros((len(gt_boxes),), bool)
        self._gt[image_id] = {
            "boxes": np.asarray(gt_boxes, np.float64).reshape(-1, 4),
            "labels": np.asarray(gt_labels, np.int64).reshape(-1),
            "iscrowd": np.asarray(gt_iscrowd, bool).reshape(-1),
        }
        self._dt[image_id] = {
            "boxes": np.asarray(det_boxes, np.float64).reshape(-1, 4),
            "scores": np.asarray(det_scores, np.float64).reshape(-1),
            "labels": np.asarray(det_labels, np.int64).reshape(-1),
        }

    def merge(self, other: "CocoEvaluator"):
        self._gt.update(other._gt)
        self._dt.update(other._dt)

    # -- evaluation -------------------------------------------------------
    def _evaluate_img(self, img_id, cat, area_rng, max_det):
        gt = self._gt[img_id]
        dt = self._dt[img_id]
        gm = gt["labels"] == cat
        dm = dt["labels"] == cat
        g = gt["boxes"][gm]
        crowd = gt["iscrowd"][gm]
        d = dt["boxes"][dm]
        ds = dt["scores"][dm]

        order = np.argsort(-ds, kind="mergesort")[:max_det]
        d = d[order]
        ds = ds[order]

        ga = np.clip(g[:, 2] - g[:, 0], 0, None) * np.clip(
            g[:, 3] - g[:, 1], 0, None
        )
        g_ignore = crowd | (ga < area_rng[0]) | (ga > area_rng[1])
        # sort gt: non-ignored first (pycocotools convention)
        g_order = np.argsort(g_ignore, kind="mergesort")
        g = g[g_order]
        g_ignore = g_ignore[g_order]
        crowd = crowd[g_order]

        ious = _iou_xyxy(d, g, crowd)
        T = len(IOU_THRS)
        D, G = len(d), len(g)
        dt_m = -np.ones((T, D), np.int64)
        gt_m = -np.ones((T, G), np.int64)
        for t, thr in enumerate(IOU_THRS):
            for di in range(D):
                best = thr
                best_g = -1
                for gi in range(G):
                    if gt_m[t, gi] >= 0 and not crowd[gi]:
                        continue
                    # stop at ignored gt if a real match was already found
                    if best_g >= 0 and not g_ignore[best_g] and g_ignore[gi]:
                        break
                    if ious[di, gi] < best:
                        continue
                    best = ious[di, gi]
                    best_g = gi
                if best_g >= 0:
                    dt_m[t, di] = best_g
                    gt_m[t, best_g] = di
        da = np.clip(d[:, 2] - d[:, 0], 0, None) * np.clip(
            d[:, 3] - d[:, 1], 0, None
        )
        d_out_of_range = (da < area_rng[0]) | (da > area_rng[1])
        dt_ignore = np.zeros((T, D), bool)
        for t in range(T):
            matched = dt_m[t] >= 0
            ig_match = np.zeros((D,), bool)
            ig_match[matched] = g_ignore[dt_m[t][matched]]
            dt_ignore[t] = ig_match | ((~matched) & d_out_of_range)
        return {
            "scores": ds,
            "dt_matched": dt_m >= 0,
            "dt_ignore": dt_ignore,
            "n_gt": int((~g_ignore).sum()),
        }

    def accumulate(self) -> Dict[str, np.ndarray]:
        img_ids = sorted(self._gt.keys())
        T, R = len(IOU_THRS), len(REC_THRS)
        A, M, K = len(AREA_RANGES), len(MAX_DETS), len(self.categories)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))

        for ki, cat in enumerate(self.categories):
            for ai, area_rng in enumerate(AREA_RANGES.values()):
                for mi, max_det in enumerate(MAX_DETS):
                    evs = [
                        self._evaluate_img(i, cat, area_rng, max_det)
                        for i in img_ids
                    ]
                    n_gt = sum(e["n_gt"] for e in evs)
                    if n_gt == 0:
                        continue
                    scores = np.concatenate([e["scores"] for e in evs])
                    order = np.argsort(-scores, kind="mergesort")
                    matched = np.concatenate(
                        [e["dt_matched"] for e in evs], axis=1
                    )[:, order]
                    ignored = np.concatenate(
                        [e["dt_ignore"] for e in evs], axis=1
                    )[:, order]
                    tps = matched & ~ignored
                    fps = ~matched & ~ignored
                    tp_cum = np.cumsum(tps, axis=1).astype(np.float64)
                    fp_cum = np.cumsum(fps, axis=1).astype(np.float64)
                    for t in range(T):
                        tp = tp_cum[t]
                        fp = fp_cum[t]
                        rc = tp / n_gt
                        pr = tp / np.maximum(tp + fp, np.finfo(float).eps)
                        recall[t, ki, ai, mi] = rc[-1] if len(rc) else 0.0
                        # monotone-decreasing interpolation from the right
                        pr = pr.tolist()
                        for i in range(len(pr) - 1, 0, -1):
                            pr[i - 1] = max(pr[i - 1], pr[i])
                        inds = np.searchsorted(rc, REC_THRS, side="left")
                        q = np.zeros((R,))
                        for ri, pi in enumerate(inds):
                            if pi < len(pr):
                                q[ri] = pr[pi]
                        precision[t, :, ki, ai, mi] = q
        return {"precision": precision, "recall": recall}

    def summarize(self) -> List[float]:
        acc = self.accumulate()

        def ap(iou=None, area="all", max_det=100):
            p = acc["precision"]
            ai = list(AREA_RANGES).index(area)
            mi = MAX_DETS.index(max_det)
            s = p[:, :, :, ai, mi]
            if iou is not None:
                s = s[np.where(np.isclose(IOU_THRS, iou))[0]]
            s = s[s > -1]
            return float(np.mean(s)) if s.size else -1.0

        def ar(area="all", max_det=100):
            r = acc["recall"]
            ai = list(AREA_RANGES).index(area)
            mi = MAX_DETS.index(max_det)
            s = r[:, :, ai, mi]
            s = s[s > -1]
            return float(np.mean(s)) if s.size else -1.0

        return [
            ap(), ap(0.5), ap(0.75),
            ap(area="small"), ap(area="medium"), ap(area="large"),
            ar(max_det=1), ar(max_det=10), ar(max_det=100),
            ar(area="small"), ar(area="medium"), ar(area="large"),
        ]
