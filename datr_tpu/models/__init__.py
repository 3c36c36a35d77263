"""Model zoo + registry (reference: models/registry.py, models/__init__.py)."""

from .registry import MODEL_REGISTRY, register_model, build_model
from . import dino  # noqa: F401  (registers 'dino')
