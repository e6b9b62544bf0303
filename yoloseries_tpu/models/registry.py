"""Model registry: name -> constructor.

Replaces the reference's per-file model selection (`select_model` switches in
each train_*.py, e.g. train_yolov5.py:216) with one lookup keyed by the
``--model`` CLI flag. Families register themselves at import.
"""

from __future__ import annotations

from typing import Any, Callable

_REGISTRY: dict[str, Callable[..., Any]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def create_model(name: str, num_class: int, **kwargs):
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model '{name}'; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](num_class=num_class, **kwargs)


def available_models() -> list[str]:
    return sorted(_REGISTRY)
