"""tools/stage_data.py — the reference's preparing_dataset capability
(datasets/data_util.py:117-169) as an explicit-path staging tool."""

import json
import os
import zipfile

from tools.stage_data import main as stage_main


def test_stage_tree_incremental(tmp_path, capsys):
    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("hello")
    (src / "sub" / "b.txt").write_text("world!")
    dst = tmp_path / "dst"

    assert stage_main([str(src), str(dst)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["copied"] == 2 and out["skipped"] == 0
    assert (dst / "sub" / "b.txt").read_text() == "world!"

    # second run skips same-size files
    assert stage_main([str(src), str(dst)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["copied"] == 0 and out["skipped"] == 2

    # changed file (different size) is re-copied
    (src / "a.txt").write_text("hello2")
    stage_main([str(src), str(dst)])
    out = json.loads(capsys.readouterr().out)
    assert out["copied"] == 1
    assert (dst / "a.txt").read_text() == "hello2"


def test_stage_zip(tmp_path, capsys):
    z = tmp_path / "d.zip"
    with zipfile.ZipFile(z, "w") as f:
        f.writestr("images/x.png", b"123")
        f.writestr("annotations.json", "{}")
    dst = tmp_path / "out"
    assert stage_main([str(z), str(dst)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["mode"] == "unzip" and out["files"] == 2
    assert os.path.exists(dst / "images" / "x.png")
