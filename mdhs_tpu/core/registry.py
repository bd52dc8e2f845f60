"""Component registries.

The reference hard-codes its component zoo in if/elif chains
(reference: model.py:104-200 fusion/head selection, scripts/train.py:255-309
optimizer selection). We replace that with named registries so every
subsystem (fusion, head, loss, optimizer, encoder, model family) is
pluggable and discoverable.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._items: Dict[str, Any] = {}

    def register(self, key: str, obj: Any = None):
        if obj is not None:
            self._add(key, obj)
            return obj

        def deco(fn):
            self._add(key, fn)
            return fn

        return deco

    def _add(self, key: str, obj: Any):
        if key in self._items:
            raise KeyError(f"{self.name}: duplicate registration for {key!r}")
        self._items[key] = obj

    def get(self, key: str):
        if key not in self._items:
            raise KeyError(
                f"{self.name}: unknown key {key!r}. Available: {sorted(self._items)}"
            )
        return self._items[key]

    def __contains__(self, key: str) -> bool:
        return key in self._items

    def keys(self):
        return sorted(self._items)


FUSIONS = Registry("fusion")
HEADS = Registry("head")
LOSSES = Registry("loss")
OPTIMIZERS = Registry("optimizer")
SCHEDULES = Registry("schedule")
MODELS = Registry("model")
