"""Tiny model registry (reference: models/registry.py:12-58 Registry /
MODULE_BUILD_FUNCS). Maps a model name to a build function
`build(cfg) -> (module, criterion, postprocess)`."""

from __future__ import annotations

from typing import Callable, Dict

MODEL_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn):
        if name in MODEL_REGISTRY:
            raise KeyError(f"model {name!r} already registered")
        MODEL_REGISTRY[name] = fn
        return fn

    return deco


def build_model(cfg):
    name = cfg.get("modelname", "dino") if hasattr(cfg, "get") else cfg.modelname
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name](cfg)
