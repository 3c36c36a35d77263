"""Named-dataset dispatch breadth (VERDICT r2 missing #5): the classic-COCO
and panoptic ingestion builders (reference datasets/__init__.py:21-45,
coco.py:611-641, coco_panoptic.py:15-104)."""

import json
import os

import numpy as np
from PIL import Image

from datr_tpu.data.coco import build_dataset
from datr_tpu.data.panoptic import masks_to_boxes, rgb2id


def _write_classic_coco(root, n=3):
    for split in ("train2017", "val2017"):
        os.makedirs(os.path.join(root, split), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    for split in ("train2017", "val2017"):
        images, anns = [], []
        for i in range(n):
            name = f"{i:012d}.jpg"
            Image.new("RGB", (64, 48), (100, 110, 120)).save(
                os.path.join(root, split, name))
            images.append({"id": i, "file_name": name,
                           "width": 64, "height": 48})
            anns.append({"id": i * 10, "image_id": i, "category_id": 1,
                         "bbox": [4, 4, 20, 16], "area": 320, "iscrowd": 0})
        with open(os.path.join(root, "annotations",
                               f"instances_{split}.json"), "w") as f:
            json.dump({"images": images, "annotations": anns,
                       "categories": [{"id": 1, "name": "thing"}]}, f)


def _id2rgb(i):
    return (i % 256, (i // 256) % 256, i // (256 * 256))


def _write_panoptic(root, n=2):
    _write_classic_coco(root, n)  # reuses the RGB images
    for split in ("train2017", "val2017"):
        pan_dir = os.path.join(root, "panoptic", f"panoptic_{split}")
        os.makedirs(pan_dir, exist_ok=True)
        os.makedirs(os.path.join(root, "panoptic", "annotations"),
                    exist_ok=True)
        images, anns = [], []
        for i in range(n):
            name = f"{i:012d}.png"
            id_map = np.zeros((48, 64, 3), np.uint8)
            # segment 7: a 10x12 box at (8, 6); segment 300: 8x8 at (30, 20)
            id_map[6:16, 8:20] = _id2rgb(7)
            id_map[20:28, 30:38] = _id2rgb(300)
            Image.fromarray(id_map).save(os.path.join(pan_dir, name))
            images.append({"id": i, "file_name": name,
                           "width": 64, "height": 48})
            anns.append({
                "image_id": i, "file_name": name,
                "segments_info": [
                    {"id": 7, "category_id": 2, "iscrowd": 0, "area": 120},
                    {"id": 300, "category_id": 5, "iscrowd": 0, "area": 64},
                ],
            })
        with open(os.path.join(root, "panoptic", "annotations",
                               f"panoptic_{split}.json"), "w") as f:
            json.dump({"images": images, "annotations": anns,
                       "categories": [{"id": 2, "name": "a"},
                                      {"id": 5, "name": "b"}]}, f)


def test_rgb2id_roundtrip():
    ids = np.array([[0, 7], [300, 256 * 256 * 3 + 5]])
    rgb = np.stack([ids % 256, (ids // 256) % 256, ids // 65536],
                   -1).astype(np.uint8)
    np.testing.assert_array_equal(rgb2id(rgb), ids)


def test_masks_to_boxes():
    m = np.zeros((2, 10, 12), bool)
    m[0, 2:5, 3:9] = True
    m[1, 7, 11] = True
    # reference (util/box_ops.py:108-132) returns the INCLUSIVE max index
    b = masks_to_boxes(m)
    np.testing.assert_array_equal(b[0], [3, 2, 8, 4])
    np.testing.assert_array_equal(b[1], [11, 7, 11, 7])


def test_classic_coco_dispatch(tmp_path):
    root = str(tmp_path)
    _write_classic_coco(os.path.join(root, "coco"))
    train = build_dataset("train", "coco", root)
    val = build_dataset("val", "coco", root)
    assert len(train) == 3 and len(val) == 3
    img, tgt = train.load(0)
    assert img.size == (64, 48)
    np.testing.assert_array_equal(tgt["boxes"][0], [4, 4, 24, 20])
    ann = val.eval_annotations(1)
    assert ann["areas"][0] == 320.0


def test_panoptic_dispatch(tmp_path):
    root = str(tmp_path)
    _write_panoptic(os.path.join(root, "coco"))
    ds = build_dataset("val", "coco_panoptic", root)
    assert len(ds) == 2
    img, tgt = ds.load(0)
    assert img.size == (64, 48)
    # boxes from mask extents (masks_to_boxes semantics: inclusive max,
    # util/box_ops.py:108-132)
    np.testing.assert_array_equal(tgt["boxes"][0], [8, 6, 19, 15])
    np.testing.assert_array_equal(tgt["boxes"][1], [30, 20, 37, 27])
    np.testing.assert_array_equal(tgt["labels"], [2, 5])
    ann = ds.eval_annotations(0)
    assert len(ann["boxes"]) == 2
    assert ann["areas"].tolist() == [120.0, 64.0]


def _write_o365(root, shards=(2, 3)):
    d = os.path.join(root, "o365")
    for split in ("train", "val"):
        os.makedirs(os.path.join(d, split, "images"), exist_ok=True)
        next_id = 0
        for s, n in enumerate(shards):
            images, anns = [], []
            for _ in range(n):
                i = next_id
                next_id += 1
                name = f"{i:08d}.jpg"
                Image.new("RGB", (40, 30), (10 * s, 20, 30)).save(
                    os.path.join(d, split, "images", name))
                images.append({"id": i, "file_name": name,
                               "width": 40, "height": 30})
                anns.append({"id": i * 10, "image_id": i, "category_id": s + 1,
                             "bbox": [2, 2, 10, 8], "area": 80, "iscrowd": 0})
            with open(os.path.join(d, split,
                                   f"annotations_{s}.json"), "w") as f:
                json.dump({"images": images, "annotations": anns,
                           "categories": [{"id": s + 1, "name": f"c{s}"}]},
                          f)


def test_o365_combine_dispatch(tmp_path):
    """Sharded-annotations combine ('o365' dispatch name,
    datasets/__init__.py:29-31): shards serve as one contiguous index and
    eval_annotations routes by image id across shards."""
    root = str(tmp_path)
    _write_o365(root)
    train = build_dataset("train", "o365", root)
    assert len(train) == 5  # 2 + 3 across shards
    # boundary indices hit the right shard
    img0, tgt0 = train.load(0)
    img4, tgt4 = train.load(4)
    assert tgt0["labels"][0] == 1 and tgt4["labels"][0] == 2
    assert img0.size == (40, 30)
    np.testing.assert_array_equal(tgt4["boxes"][0], [2, 2, 12, 10])
    # eval GT lookup crosses shard boundaries by image id
    ann = train.eval_annotations(3)
    assert ann["labels"][0] == 2 and ann["areas"][0] == 80.0
    val = build_dataset("val", "o365", root)
    assert len(val) == 5
