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


def test_merge_across_processes_matches_single(tmp_path, monkeypatch):
    ds = _dataset(tmp_path, n=4)
    raw_gt = ds.eval_annotations
    rng = np.random.default_rng(0)
    num_select = 6

    def dets(iid):
        r = np.random.default_rng(iid)
        xy = r.uniform(0, 40, (num_select, 2))
        wh = r.uniform(5, 30, (num_select, 2))
        return (np.concatenate([xy, xy + wh], 1).astype(np.float32),
                r.uniform(0, 1, (num_select,)).astype(np.float32),
                r.integers(1, 3, (num_select,)).astype(np.int32))

    # single-process reference: all 4 images on one evaluator
    ref = CocoEvaluator([1, 2])
    for iid in (100, 101, 102, 103):
        ann = raw_gt(iid)
        b, s, l = dets(iid)
        ref.add_image(iid, ann["boxes"], ann["labels"], b, s, l,
                      gt_iscrowd=ann["iscrowd"], gt_areas=ann["areas"])
    ref_stats = ref.summarize()

    # simulated 2-process run: process 0 holds 100,102; process 1: 101,103
    shards = [[100, 102], [101, 103]]

    def fake_allgather(tree):
        # what each process would contribute, stacked on a leading axis
        outs = []
        for p, shard in enumerate(shards):
            ids = np.full((2,), -1, np.int64)
            boxes = np.zeros((2, num_select, 4), np.float32)
            scores = np.zeros((2, num_select), np.float32)
            labels = np.zeros((2, num_select), np.int32)
            for i, iid in enumerate(shard):
                ids[i] = iid
                boxes[i], scores[i], labels[i] = dets(iid)
            outs.append((ids, boxes, scores, labels))
        if isinstance(tree, tuple):
            return tuple(np.stack([o[k] for o in outs])
                         for k in range(4))
        return np.stack([np.asarray(tree)] * 2)  # the n_local gather

    import datr_tpu.engine as engine
    from jax.experimental import multihost_utils

    monkeypatch.setattr(multihost_utils, "process_allgather",
                        fake_allgather)
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)

    ev = CocoEvaluator([1, 2])
    det_records = []
    for iid in shards[0]:
        ann = raw_gt(iid)
        b, s, l = dets(iid)
        ev.add_image(iid, ann["boxes"], ann["labels"], b, s, l,
                     gt_iscrowd=ann["iscrowd"], gt_areas=ann["areas"])
        det_records.append((iid, b, s, l))
    _merge_across_processes(ev, det_records, raw_gt, num_select)
    np.testing.assert_allclose(ev.summarize(), ref_stats, atol=1e-12)
