"""Lightweight model registry — replaces the reference's timm string dispatch.

The reference registers VAN / EfficientNet variants into timm and builds them with
``timm.create_model(name, num_classes=..., in_chans=...)`` (reference:
yolo_seg/tasks/needle_clasify.py:41-61, yolo_seg/tasks/models/van.py:291,
yolo_seg/tasks/models/efficientnet.py:5).  Here the registry maps a model name to a
constructor returning a flax.linen Module.
"""

from __future__ import annotations

from typing import Callable, Dict

_MODEL_REGISTRY: Dict[str, Callable] = {}


def register_model(fn: Callable = None, *, name: str = None):
    """Decorator: register a model constructor under its function name (or ``name``)."""

    def _register(f):
        key = name or f.__name__
        _MODEL_REGISTRY[key] = f
        return f

    if fn is not None:
        return _register(fn)
    return _register


def create_model(name: str, **kwargs):
    """Instantiate a registered model by name (timm.create_model equivalent)."""
    if name not in _MODEL_REGISTRY:
        raise KeyError(
            f"Unknown model '{name}'. Registered: {sorted(_MODEL_REGISTRY)}"
        )
    return _MODEL_REGISTRY[name](**kwargs)


def list_models() -> list:
    return sorted(_MODEL_REGISTRY)
