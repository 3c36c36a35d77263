"""Mask-AP (segm) evaluation: RLE utilities, mask IoU, the segm
CocoEvaluator mode, host-side detection-mask finishing, and the engine
wiring (reference: CocoEvaluator(base_ds, ('bbox','segm')) when args.masks
— datasets/coco_eval.py:23-35, engine.py:364,514-517)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from datr_tpu.eval.coco_eval import CocoEvaluator, _iou_xyxy
from datr_tpu.utils.rle import (
    area_of_counts,
    counts_from_string,
    decode_counts,
    encode_mask,
    mask_iou,
    masks_to_rles,
    string_from_counts,
)


def test_rle_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    for shape in [(1, 1), (7, 9), (33, 17), (64, 64)]:
        m = rng.random(shape) > 0.5
        c = encode_mask(m)
        np.testing.assert_array_equal(decode_counts(c, *shape), m)
        assert area_of_counts(c) == int(m.sum())
        # string round-trip (maskApi.c coding)
        assert counts_from_string(string_from_counts(c)) == list(c)
    # all-zero / all-one masks
    z = np.zeros((5, 4), bool)
    np.testing.assert_array_equal(decode_counts(encode_mask(z), 5, 4), z)
    o = np.ones((5, 4), bool)
    np.testing.assert_array_equal(decode_counts(encode_mask(o), 5, 4), o)


def _rect_mask(h, w, box):
    x0, y0, x1, y1 = [int(v) for v in box]
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_mask_iou_matches_box_iou_on_rectangles():
    """Axis-aligned rectangle masks: mask IoU must equal box IoU, including
    the crowd denominator rule."""
    h, w = 50, 60
    d_boxes = np.array([[5, 5, 20, 25], [10, 10, 30, 30], [40, 5, 55, 45]],
                       np.float64)
    g_boxes = np.array([[6, 4, 22, 24], [38, 10, 50, 40]], np.float64)
    iscrowd = np.array([False, True])
    d_rles = masks_to_rles(np.stack([_rect_mask(h, w, b) for b in d_boxes]))
    g_rles = masks_to_rles(np.stack([_rect_mask(h, w, b) for b in g_boxes]))
    got = mask_iou(d_rles, g_rles, iscrowd, h, w)
    want = _iou_xyxy(d_boxes, g_boxes, iscrowd)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_segm_evaluator_matches_bbox_on_rectangles():
    """With rectangle masks whose extents equal the boxes, the segm
    evaluator must reproduce the bbox evaluator's 12 stats exactly."""
    rng = np.random.default_rng(1)
    h, w = 64, 80
    ev_b = CocoEvaluator([1, 2])
    ev_s = CocoEvaluator([1, 2], iou_type="segm")
    for iid in range(4):
        g, d, gl, dl, ds = [], [], [], [], []
        for k in range(3):
            x0, y0 = rng.integers(0, 40, 2)
            bw, bh = rng.integers(5, 20, 2)
            g.append([x0, y0, x0 + bw, y0 + bh])
            gl.append(int(rng.integers(1, 3)))
            # jittered detection
            d.append([x0 + rng.integers(-3, 4), y0 + rng.integers(-3, 4),
                      x0 + bw + rng.integers(-3, 4),
                      y0 + bh + rng.integers(-3, 4)])
            dl.append(gl[-1] if rng.random() < 0.8 else 3 - gl[-1])
            ds.append(float(rng.random()))
        g = np.clip(np.asarray(g, np.float64), 0, [w, h, w, h])
        d = np.clip(np.asarray(d, np.float64), 0, [w, h, w, h])
        d[:, 2:] = np.maximum(d[:, 2:], d[:, :2] + 1)
        gm = np.stack([_rect_mask(h, w, b) for b in g])
        dm = np.stack([_rect_mask(h, w, b) for b in d])
        crowd = np.array([False, False, True])
        kw = dict(gt_boxes=g, gt_labels=np.asarray(gl),
                  det_boxes=d, det_scores=np.asarray(ds),
                  det_labels=np.asarray(dl), gt_iscrowd=crowd)
        ev_b.add_image(iid, **kw)
        ev_s.add_image(iid, **kw, gt_masks=gm, det_masks=dm)
    sb = ev_b.summarize()
    ss = ev_s.summarize()
    # gt areas default to box area in bbox mode and are passed identically;
    # rectangle masks make every IoU identical -> identical stats
    np.testing.assert_allclose(ss, sb, atol=1e-12)


def test_segm_evaluator_distinguishes_shapes():
    """Same boxes, different shapes: a detection whose mask covers only
    half the GT mask must lose segm AP while bbox AP stays perfect."""
    h, w = 40, 40
    box = np.array([[10, 10, 30, 30]], np.float64)
    gm = _rect_mask(h, w, box[0])[None]
    half = _rect_mask(h, w, [10, 10, 20, 30])[None]  # left half only
    common = dict(gt_boxes=box, gt_labels=np.array([1]),
                  det_boxes=box, det_scores=np.array([0.9]),
                  det_labels=np.array([1]))
    ev_b = CocoEvaluator([1])
    ev_b.add_image(0, **common)
    ev_s = CocoEvaluator([1], iou_type="segm")
    ev_s.add_image(0, **common, gt_masks=gm, det_masks=half)
    assert ev_b.summarize()[0] == pytest.approx(1.0)
    # mask IoU = 0.5 -> matches only at thresholds 0.50; AP ~ 1/10
    assert ev_s.summarize()[0] == pytest.approx(0.1, abs=1e-6)
    assert ev_s.summarize()[1] == pytest.approx(1.0)  # AP50 still perfect


def test_det_mask_rles_finishing():
    """Stride-4 logits -> canvas upsample -> crop -> orig resize -> RLE."""
    from datr_tpu.models.segmentation import det_mask_rles

    H, W = 32, 48  # canvas
    logits = np.full((2, H // 4, W // 4), -5.0, np.float32)
    logits[0, 2:5, 3:7] = 5.0  # blob ~ canvas rows 8..20, cols 12..28
    rles = det_mask_rles(logits, (H, W), real_hw=(24, 36), orig_hw=(48, 72))
    m0 = decode_counts(rles[0], 48, 72)
    # blob center present, corner empty
    assert m0[28, 40] and not m0[0, 0]
    assert area_of_counts(rles[1]) == 0
    # area scales ~(12x16 canvas px) x crop x 2x resize in each dim
    assert 500 <= area_of_counts(rles[0]) <= 1200


def test_bilinear_np_matches_jax():
    import jax.numpy as jnp
    from jax.image import resize as jresize

    from datr_tpu.models.segmentation import _bilinear_np

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 9, 13)).astype(np.float32)
    got = _bilinear_np(x, 20, 31)
    want = np.asarray(jresize(jnp.asarray(x), (2, 20, 31), method="linear"))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_engine_evaluate_segm(tmp_path):
    """engine.evaluate(segm=True) end to end: with_masks model, val dataset
    with GT mask RLEs, returns finite coco_eval_masks (12 stats)."""
    import jax
    import jax.numpy as jnp

    from datr_tpu.data.coco import CocoDetectionDataset
    from datr_tpu.data.loader import make_eval_loader
    from datr_tpu.data.transforms import EvalTransform
    from datr_tpu.engine import evaluate
    from datr_tpu.models.dino import DINO

    # tiny dataset with polygon masks
    root = tmp_path / "d"
    os.makedirs(root / "images")
    images, annotations = [], []
    rng = np.random.default_rng(0)
    for i in range(2):
        fn = f"x{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (48, 64, 3), np.uint8)
        ).save(root / "images" / fn)
        images.append({"id": i + 1, "file_name": fn,
                       "height": 48, "width": 64})
        annotations.append({
            "id": i + 1, "image_id": i + 1, "category_id": 1,
            "bbox": [10, 10, 20, 15], "area": 300, "iscrowd": 0,
            "segmentation": [[10.0, 10.0, 30.0, 10.0, 30.0, 25.0,
                              10.0, 25.0]],
        })
    with open(root / "annotations.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "a"}]}, f)
    ds = CocoDetectionDataset(str(root / "images"),
                              str(root / "annotations.json"),
                              return_masks=True)

    model = DINO(
        num_classes=3, num_queries=6, hidden_dim=128, nheads=8,
        enc_layers=1, dec_layers=2, dim_feedforward=32, dn_number=0,
        with_masks=True, use_remat=False,
    )
    rngk = jax.random.PRNGKey(0)
    params = model.init(rngk, jnp.zeros((1, 64, 64, 3)),
                        jnp.zeros((1, 64, 64), bool))
    loader = make_eval_loader(ds, 2, (64, 64), EvalTransform(48, 64),
                              max_boxes=4, num_threads=1)
    stats = evaluate(params, model, loader, [1], num_select=5)
    assert "coco_eval_masks" not in stats  # segm off by default
    stats = evaluate(params, model, loader, [1], num_select=5, segm=True)
    assert len(stats["coco_eval_masks"]) == 12
    assert all(np.isfinite(v) for v in stats["coco_eval_masks"])
    assert len(stats["coco_eval_bbox"]) == 12


def test_merge_segm_across_processes(monkeypatch):
    """Simulated 2-process segm merge: the padded flat-buffer allgather must
    reproduce the single-evaluator stats exactly."""
    import jax

    from datr_tpu.engine import _merge_segm_across_processes

    h, w = 40, 50
    rng = np.random.default_rng(5)

    def make_img(iid):
        g = np.array([[5 + iid, 5, 25 + iid, 20]], np.float64)
        d = g + rng.integers(-2, 3, size=(1, 4))
        gm = masks_to_rles(np.stack([_rect_mask(h, w, b) for b in g]))
        dm = masks_to_rles(np.stack([_rect_mask(h, w, b) for b in d]))
        return dict(
            boxes=d, scores=np.array([0.8]), labels=np.array([1]),
            rles=dm,
            gt=dict(boxes=g, labels=np.array([1]),
                    iscrowd=np.array([False]), areas=np.array([300.0]),
                    masks=gm, mask_size=(h, w)),
        )

    data = {iid: make_img(iid) for iid in (1, 2, 3, 4)}
    def raw_gt(iid, with_masks=False):
        # mimic eval_annotations: masks travel ONLY on explicit request —
        # the merge path must pass with_masks=True or this raises KeyError
        gt = dict(data[iid]["gt"])
        if not with_masks:
            gt.pop("masks")
            gt.pop("mask_size")
        return gt

    # single-evaluator reference over all 4 images
    ref = CocoEvaluator([1], iou_type="segm")
    for iid, r in data.items():
        ref.add_image(iid, det_boxes=r["boxes"], det_scores=r["scores"],
                      det_labels=r["labels"], det_masks=r["rles"],
                      **{f"gt_{k}": v for k, v in r["gt"].items()
                         if k not in ("masks", "mask_size")},
                      gt_masks=r["gt"]["masks"],
                      mask_size=r["gt"]["mask_size"])
    ref_stats = ref.summarize()

    def pack(shard):
        ints, floats = [], []
        for iid in shard:
            r = data[iid]
            ints += [iid, len(r["scores"])]
            for j in range(len(r["scores"])):
                c = np.asarray(r["rles"][j], np.int64)
                ints += [int(r["labels"][j]), len(c)] + c.tolist()
                floats.append([float(r["scores"][j]),
                               *map(float, r["boxes"][j])])
        return (np.asarray(ints, np.int64),
                np.asarray(floats, np.float64).reshape(-1, 5))

    shards = [[1, 3], [2, 4]]
    bufs = [pack(s) for s in shards]

    def fake_allgather(tree):
        if not isinstance(tree, tuple):  # the [isize, fsize] length gather
            return np.stack([
                np.array([b[0].size, b[1].shape[0]], np.int64)
                for b in bufs
            ])
        mi = max(b[0].size for b in bufs)
        mf = max(b[1].shape[0] for b in bufs)
        gi = np.zeros((2, mi), np.int64)
        gf = np.zeros((2, mf, 5), np.float64)
        for p, b in enumerate(bufs):
            gi[p, : b[0].size] = b[0]
            gf[p, : b[1].shape[0]] = b[1]
        return gi, gf

    from jax.experimental import multihost_utils

    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)

    ev = CocoEvaluator([1], iou_type="segm")
    records = []
    for iid in shards[0]:
        r = data[iid]
        ev.add_image(iid, det_boxes=r["boxes"], det_scores=r["scores"],
                     det_labels=r["labels"], det_masks=r["rles"],
                     gt_boxes=r["gt"]["boxes"], gt_labels=r["gt"]["labels"],
                     gt_iscrowd=r["gt"]["iscrowd"],
                     gt_areas=r["gt"]["areas"], gt_masks=r["gt"]["masks"],
                     mask_size=r["gt"]["mask_size"])
        records.append(dict(image_id=iid, boxes=r["boxes"],
                            scores=r["scores"], labels=r["labels"],
                            rles=r["rles"]))
    _merge_segm_across_processes(ev, records, raw_gt)
    np.testing.assert_allclose(ev.summarize(), ref_stats, atol=1e-12)
