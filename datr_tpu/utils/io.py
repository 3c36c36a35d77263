"""Small IO + class-mapping utilities.

Capability match for the reference's util/slio.py (sl_load/sl_dump with
json / pickle / yaml handlers picked by extension) and the COCO 91->80
category mapper (util/utils.py:52-66 CocoClassMapper). The 80 detection
categories of COCO occupy sparse ids in 1..90; the mapper converts between
the sparse "origin" ids and compact 0..79 indices — derived here from the
id gaps rather than a hardcoded table.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any

# COCO ids absent from the 80-class detection set (of 1..90)
_COCO_MISSING = (12, 26, 29, 30, 45, 66, 68, 69, 71, 83)
_ORIGIN_IDS = [i for i in range(1, 91) if i not in _COCO_MISSING]


class CocoClassMapper:
    """COCO sparse category id (1..90) <-> compact index (0..79)."""

    def __init__(self) -> None:
        self.origin2compact_mapper = {o: c for c, o in enumerate(_ORIGIN_IDS)}
        self.compact2origin_mapper = {c: o for c, o in enumerate(_ORIGIN_IDS)}

    def origin2compact(self, idx) -> int:
        return self.origin2compact_mapper[int(idx)]

    def compact2origin(self, idx) -> int:
        return self.compact2origin_mapper[int(idx)]


def _handler(filepath: str):
    ext = os.path.splitext(filepath)[1].lower().lstrip(".")
    if ext == "json":
        return "json"
    if ext in ("pkl", "pickle"):
        return "pickle"
    if ext in ("yml", "yaml"):
        return "yaml"
    raise ValueError(f"unsupported file extension: {filepath!r}")


def sl_load(filepath: str, **kwargs) -> Any:
    """Load json/pickle/yaml by extension (slio.py:sl_load)."""
    kind = _handler(filepath)
    if kind == "json":
        with open(filepath) as f:
            return json.load(f, **kwargs)
    if kind == "pickle":
        with open(filepath, "rb") as f:
            return pickle.load(f, **kwargs)
    import yaml

    with open(filepath) as f:
        return yaml.safe_load(f)


def sl_dump(obj: Any, filepath: str, **kwargs) -> None:
    """Dump json/pickle/yaml by extension (slio.py:sl_dump)."""
    kind = _handler(filepath)
    if kind == "json":
        with open(filepath, "w") as f:
            json.dump(obj, f, default=str, **kwargs)
    elif kind == "pickle":
        with open(filepath, "wb") as f:
            pickle.dump(obj, f, **kwargs)
    else:
        import yaml

        with open(filepath, "w") as f:
            yaml.safe_dump(obj, f)
