"""Real COCO-format ingestion: JSON parsing, annotation filtering, DA
pairing from a directory layout on disk (replaces pycocotools loading,
DAcoco.py:365-480)."""

import json
import os
import random

import numpy as np
from PIL import Image

from datr_tpu.data.coco import (
    CocoDetectionDataset,
    DAPairedDataset,
    build_dataset,
)


def _write_coco(root, n=3, hw=(60, 80), prefix="img"):
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    images, annotations = [], []
    aid = 1
    rng = np.random.default_rng(0)
    for i in range(n):
        fn = f"{prefix}{i}.png"
        arr = rng.integers(0, 255, (*hw, 3), np.uint8)
        Image.fromarray(arr).save(os.path.join(root, "images", fn))
        images.append({"id": 100 + i, "file_name": fn,
                       "height": hw[0], "width": hw[1]})
        # one normal box, one degenerate (dropped), one crowd (dropped)
        annotations += [
            {"id": aid, "image_id": 100 + i, "category_id": 1,
             "bbox": [10, 10, 30, 20], "area": 600, "iscrowd": 0},
            {"id": aid + 1, "image_id": 100 + i, "category_id": 2,
             "bbox": [50, 50, 0, 5], "area": 0, "iscrowd": 0},
            {"id": aid + 2, "image_id": 100 + i, "category_id": 1,
             "bbox": [5, 5, 10, 10], "area": 100, "iscrowd": 1},
        ]
        aid += 3
    with open(os.path.join(root, "annotations.json"), "w") as f:
        json.dump({
            "images": images,
            "annotations": annotations,
            "categories": [{"id": 1, "name": "car"},
                           {"id": 2, "name": "person"}],
        }, f)


def test_coco_dataset_loading(tmp_path):
    root = str(tmp_path / "src")
    _write_coco(root)
    ds = CocoDetectionDataset(os.path.join(root, "images"),
                              os.path.join(root, "annotations.json"))
    assert len(ds) == 3
    img, tgt = ds.load(0)
    assert img.size == (80, 60)
    # degenerate + crowd dropped -> 1 box
    assert tgt["boxes"].shape == (1, 4)
    np.testing.assert_allclose(tgt["boxes"][0], [10, 10, 40, 30])
    assert tgt["labels"][0] == 1
    assert tgt["image_id"] == 100
    assert sorted(ds.index.cats) == [1, 2]


def test_da_directory_layout(tmp_path):
    d = tmp_path / "city2foggy"
    for sub, n in (("source", 3), ("target", 2), ("val", 2)):
        _write_coco(str(d / sub), n=n, prefix=sub)
    train = build_dataset("train", "city2foggy", str(tmp_path))
    assert isinstance(train, DAPairedDataset)
    assert len(train) == 3  # max(source, target)
    s_img, s_strong, s_tgt, t_img, t_strong, t_tgt = train.load(
        2, random.Random(0)
    )
    # target indexes modulo its length
    assert t_tgt["image_id"] == 100  # 2 % 2 == 0
    assert s_tgt["image_id"] == 102
    val = build_dataset("val", "city2foggy", str(tmp_path))
    assert len(val) == 2
