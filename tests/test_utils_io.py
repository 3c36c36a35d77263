"""utils/io.py (slio + CocoClassMapper) and utils/plot_utils.py tests."""

import json

import pytest

from datr_tpu.utils.io import CocoClassMapper, sl_dump, sl_load
from datr_tpu.utils.plot_utils import extract_fields, read_log


def test_coco_class_mapper_matches_reference_table():
    m = CocoClassMapper()
    # spot-check against util/utils.py:54 entries (origin -> 1-based compact)
    ref = {1: 1, 11: 11, 13: 12, 27: 25, 46: 41, 67: 61, 84: 74, 90: 80}
    for origin, compact_1b in ref.items():
        assert m.origin2compact(origin) == compact_1b - 1
        assert m.compact2origin(compact_1b - 1) == origin
    assert len(m.origin2compact_mapper) == 80


def test_sl_load_dump_roundtrip(tmp_path):
    obj = {"a": [1, 2, 3], "b": "x"}
    for name in ("f.json", "f.pkl"):
        p = str(tmp_path / name)
        sl_dump(obj, p)
        assert sl_load(p) == obj
    with pytest.raises(ValueError):
        sl_dump(obj, str(tmp_path / "f.txt"))


def test_read_log_and_extract(tmp_path):
    rows = [
        {"epoch": 0, "train_loss": 10.0, "ap50_student": 0.1},
        {"epoch": 1, "train_loss": 8.0, "ap50_student": 0.2},
        {"epoch": 2, "train_loss": 6.0},
    ]
    with open(tmp_path / "log.txt", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write("not json\n")
    got = read_log(str(tmp_path))
    assert len(got) == 3
    data = extract_fields(got, ["train_loss", "ap50_student"])
    assert data["train_loss"] == [10.0, 8.0, 6.0]
    assert data["ap50_student"] == [0.1, 0.2]
    sm = extract_fields(got, ["train_loss"], ewm_alpha=0.5)["train_loss"]
    assert sm[0] == 10.0 and sm[1] == 9.0
