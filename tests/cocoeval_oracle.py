"""Test-only oracle: a faithful, unoptimized re-implementation of the
pycocotools COCOeval bbox protocol (pycocotools/cocoeval.py semantics), used
to cross-validate datr_tpu/eval/coco_eval.py on adversarial fixtures.

pycocotools is not installable in this image (no network), so equivalence is
established by two independently-written implementations: this one mirrors
pycocotools' published control flow literally (per-annotation dicts, the
evaluateImg greedy loop with the crowd/ignore/break rules, accumulate with
mergesort + searchsorted), while the production evaluator is vectorized with
a restructured loop order. Agreement on fixtures engineered around the known
edge cases (score ties, IoU ties, crowd denominators, area boundaries,
maxDets truncation, empty images/categories) is the strongest check
available offline.

Protocol references: pycocotools cocoeval.py (COCOeval.evaluateImg,
COCOeval.accumulate, COCOeval.summarize), matching the reference's usage in
datasets/coco_eval.py:22-266.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = [
    (0.0, 1e5 ** 2),
    (0.0, 32.0 ** 2),
    (32.0 ** 2, 96.0 ** 2),
    (96.0 ** 2, 1e5 ** 2),
]
MAX_DETS = [1, 10, 100]


def _iou(d_boxes, g_boxes, iscrowd):
    """xyxy IoU with the crowd rule (union = det area for crowd gt)."""
    out = np.zeros((len(d_boxes), len(g_boxes)))
    for i, d in enumerate(d_boxes):
        da = max(d[2] - d[0], 0) * max(d[3] - d[1], 0)
        for j, g in enumerate(g_boxes):
            ga = max(g[2] - g[0], 0) * max(g[3] - g[1], 0)
            iw = min(d[2], g[2]) - max(d[0], g[0])
            ih = min(d[3], g[3]) - max(d[1], g[1])
            inter = max(iw, 0) * max(ih, 0)
            union = da if iscrowd[j] else da + ga - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


class OracleCocoEval:
    """add_image mirrors datr_tpu.eval.coco_eval.CocoEvaluator's API."""

    def __init__(self, categories):
        self.cats = sorted(set(int(c) for c in categories))
        self.gts = {}  # (img, cat) -> list of gt dicts
        self.dts = {}
        self.img_ids = []

    def add_image(self, image_id, gt_boxes, gt_labels, det_boxes, det_scores,
                  det_labels, gt_iscrowd=None, gt_areas=None):
        image_id = int(image_id)
        self.img_ids.append(image_id)
        gt_boxes = np.asarray(gt_boxes, np.float64).reshape(-1, 4)
        det_boxes = np.asarray(det_boxes, np.float64).reshape(-1, 4)
        if gt_iscrowd is None:
            gt_iscrowd = np.zeros((len(gt_boxes),), bool)
        if gt_areas is None:
            gt_areas = (
                np.clip(gt_boxes[:, 2] - gt_boxes[:, 0], 0, None)
                * np.clip(gt_boxes[:, 3] - gt_boxes[:, 1], 0, None)
            )
        for cat in self.cats:
            self.gts[(image_id, cat)] = [
                {
                    "bbox": gt_boxes[i],
                    "area": float(gt_areas[i]),
                    "iscrowd": bool(gt_iscrowd[i]),
                }
                for i in range(len(gt_boxes))
                if int(gt_labels[i]) == cat
            ]
            self.dts[(image_id, cat)] = [
                {"bbox": det_boxes[i], "score": float(det_scores[i])}
                for i in range(len(det_boxes))
                if int(det_labels[i]) == cat
            ]

    # -- mirrors COCOeval.evaluateImg ------------------------------------
    def _evaluate_img(self, img, cat, a_rng, max_det):
        gt = self.gts[(img, cat)]
        dt = self.dts[(img, cat)]
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            g["_ignore"] = 1 if (
                g["iscrowd"] or g["area"] < a_rng[0] or g["area"] > a_rng[1]
            ) else 0
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[:max_det]]
        iscrowd = [int(g["iscrowd"]) for g in gt]
        ious = _iou([d["bbox"] for d in dt], [g["bbox"] for g in gt],
                    iscrowd)

        T = len(IOU_THRS)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G)) - 1
        dtm = np.zeros((T, D)) - 1
        gt_ig = np.array([g["_ignore"] for g in gt])
        dt_ig = np.zeros((T, D))
        for tind, t in enumerate(IOU_THRS):
            for dind, d in enumerate(dt):
                iou = min(t, 1 - 1e-10)
                m = -1
                for gind, g in enumerate(gt):
                    if gtm[tind, gind] >= 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = m
                gtm[tind, m] = dind
        a = np.array([
            (max(d["bbox"][2] - d["bbox"][0], 0)
             * max(d["bbox"][3] - d["bbox"][1], 0)) < a_rng[0]
            or (max(d["bbox"][2] - d["bbox"][0], 0)
                * max(d["bbox"][3] - d["bbox"][1], 0)) > a_rng[1]
            for d in dt
        ]).reshape(1, D)
        dt_ig = np.logical_or(
            dt_ig, np.logical_and(dtm == -1, np.repeat(a, T, 0))
        )
        return {
            "dtMatches": dtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gt_ig,
            "dtIgnore": dt_ig,
        }

    # -- mirrors COCOeval.accumulate + summarize -------------------------
    def summarize(self):
        img_ids = sorted(set(self.img_ids))
        T, R = len(IOU_THRS), len(REC_THRS)
        K, A, M = len(self.cats), len(AREA_RNGS), len(MAX_DETS)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        max_det_top = MAX_DETS[-1]

        for k, cat in enumerate(self.cats):
            for a, a_rng in enumerate(AREA_RNGS):
                E = [self._evaluate_img(i, cat, a_rng, max_det_top)
                     for i in img_ids]
                E = [e for e in E if e is not None]
                if len(E) == 0:
                    continue
                for m, max_det in enumerate(MAX_DETS):
                    dt_scores = np.concatenate(
                        [e["dtScores"][0:max_det] for e in E]
                    )
                    inds = np.argsort(-dt_scores, kind="mergesort")
                    dtm = np.concatenate(
                        [e["dtMatches"][:, 0:max_det] for e in E], axis=1
                    )[:, inds]
                    dt_ig = np.concatenate(
                        [e["dtIgnore"][:, 0:max_det] for e in E], axis=1
                    )[:, inds]
                    gt_ig = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gt_ig == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm >= 0, np.logical_not(dt_ig))
                    fps = np.logical_and(dtm == -1, np.logical_not(dt_ig))
                    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                    for t in range(T):
                        tp = tp_sum[t]
                        fp = fp_sum[t]
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        recall[t, k, a, m] = rc[-1] if nd else 0
                        pr = pr.tolist()
                        q = q.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds2 = np.searchsorted(rc, REC_THRS, side="left")
                        try:
                            for ri, pi in enumerate(inds2):
                                q[ri] = pr[pi]
                        except IndexError:
                            pass
                        precision[t, :, k, a, m] = np.array(q)

        def _sum_ap(iou=None, a=0, m=2):
            s = precision[:, :, :, a, m]
            if iou is not None:
                s = s[np.where(np.isclose(IOU_THRS, iou))[0]]
            s = s[s > -1]
            return float(np.mean(s)) if s.size else -1.0

        def _sum_ar(a=0, m=2):
            s = recall[:, :, a, m]
            s = s[s > -1]
            return float(np.mean(s)) if s.size else -1.0

        return [
            _sum_ap(), _sum_ap(0.5), _sum_ap(0.75),
            _sum_ap(a=1), _sum_ap(a=2), _sum_ap(a=3),
            _sum_ar(m=0), _sum_ar(m=1), _sum_ar(m=2),
            _sum_ar(a=1), _sum_ar(a=2), _sum_ar(a=3),
        ]
