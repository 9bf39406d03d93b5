"""Model / task registries (mirror of lmms-eval api/registry.py:8-118)."""

from __future__ import annotations

from typing import Callable, Dict, Type

MODEL_REGISTRY: Dict[str, Type] = {}
TASK_REGISTRY: Dict[str, "object"] = {}


def register_model(*names: str) -> Callable:
    def deco(cls):
        for n in names:
            MODEL_REGISTRY[n] = cls
        return cls
    return deco


def get_model(name: str):
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown model '{name}'; available: "
                       f"{sorted(MODEL_REGISTRY)}")


def register_task(name: str, task) -> None:
    TASK_REGISTRY[name] = task


def get_task(name: str):
    try:
        return TASK_REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown task '{name}'; available: "
                       f"{sorted(TASK_REGISTRY)}")
