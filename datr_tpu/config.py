"""Python-file config system with `_base_` inheritance and CLI overrides.

Capability match for the reference's SLConfig (util/slconfig.py): configs are
plain python files defining module-level variables (:80-111), may inherit from
a list of `_base_` files (:118-145), support `_delete_` to drop inherited keys,
deep-merge dict overrides (merge_from_dict :365), and `key=value` CLI override
parsing (DictAction :408). Implemented from scratch on a plain dict with
attribute access — no addict/yapf dependency.
"""

from __future__ import annotations

import ast
import copy
import importlib.util
import os
import sys
from typing import Any, Dict, List


class Config(dict):
    """dict with attribute access; nested dicts are wrapped on the fly."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        if isinstance(v, dict) and not isinstance(v, Config):
            v = Config(v)
            self[k] = v
        return v

    def __setattr__(self, k, v):
        self[k] = v

    def clone(self) -> "Config":
        return Config(copy.deepcopy(dict(self)))


_DELETE = "_delete_"
_BASE = "_base_"


def _exec_py_config(path: str) -> Dict[str, Any]:
    path = os.path.abspath(path)
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    name = f"_datr_cfg_{abs(hash(path))}"
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    try:
        spec.loader.exec_module(mod)
        cfg = {
            k: copy.deepcopy(v)
            for k, v in vars(mod).items()
            if not k.startswith("__") and not callable(v)
            and not isinstance(v, type(sys))
        }
    finally:
        sys.modules.pop(name, None)
    return cfg


def deep_merge(base: Dict, override: Dict) -> Dict:
    """Merge override into base (override wins); `_delete_: True` in a nested
    override dict replaces instead of merging (slconfig.py:118-145)."""
    out = dict(base)
    for k, v in override.items():
        if (
            isinstance(v, dict)
            and k in out
            and isinstance(out[k], dict)
            and not v.get(_DELETE, False)
        ):
            out[k] = deep_merge(out[k], v)
        else:
            if isinstance(v, dict):
                v = {kk: vv for kk, vv in v.items() if kk != _DELETE}
            out[k] = v
    return out


def load_config(path: str) -> Config:
    cfg = _exec_py_config(path)
    bases = cfg.pop(_BASE, [])
    if isinstance(bases, str):
        bases = [bases]
    merged: Dict[str, Any] = {}
    for b in bases:
        bpath = os.path.join(os.path.dirname(os.path.abspath(path)), b)
        merged = deep_merge(merged, dict(load_config(bpath)))
    return Config(deep_merge(merged, cfg))


def parse_override(kv: str) -> Dict[str, Any]:
    """'a.b=1' -> {'a': {'b': 1}} with literal-eval of the value
    (DictAction equivalent, slconfig.py:408-440)."""
    if "=" not in kv:
        raise ValueError(f"override must be key=value, got {kv!r}")
    key, raw = kv.split("=", 1)
    try:
        val = ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        # reference DictAction semantics (slconfig.py:425-429): case-
        # insensitive bool/none words — scripts pass embed_init_tgt=TRUE,
        # and 'FALSE' must not become a truthy string
        low = raw.lower()
        if low in ("true", "false"):
            val = low == "true"
        elif low in ("none", "null"):
            val = None
        else:
            val = raw  # plain string
    node: Dict[str, Any] = {}
    cur = node
    parts = key.strip().split(".")
    for p in parts[:-1]:
        cur[p] = {}
        cur = cur[p]
    cur[parts[-1]] = val
    return node


def apply_overrides(cfg: Config, options: List[str]) -> Config:
    out = dict(cfg)
    for kv in options or []:
        out = deep_merge(out, parse_override(kv))
    return Config(out)
