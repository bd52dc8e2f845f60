"""Config system: nested-dict configs loaded from YAML.

Mirrors the reference's liberal YAML schema (reference: config.yml,
configs/common/base.yml, scripts/train.py:93-100 `yaml.safe_load` + chained
`.get(..., default)` access) but adds:

- dotted-path access:  ``cfg.get("model.image_encoder.backbone", "resnet18")``
- deep merge of partial configs over a base config
- CLI-style overrides ("model.num_classes=7")
- provenance snapshot (config copied into the run dir, train.py:155)
"""

from __future__ import annotations

import copy
import io
import os
from typing import Any, Mapping

import yaml


def _deep_merge(base: dict, override: Mapping) -> dict:
    out = copy.deepcopy(base)
    for key, val in override.items():
        if key in out and isinstance(out[key], dict) and isinstance(val, Mapping):
            out[key] = _deep_merge(out[key], val)
        else:
            out[key] = copy.deepcopy(val)
    return out


def _coerce(value: str) -> Any:
    """Parse a CLI override value with YAML semantics ("7"->int, "true"->bool)."""
    try:
        return yaml.safe_load(value)
    except yaml.YAMLError:
        return value


class Config:
    """A nested mapping with dotted-path get/set and YAML round-tripping."""

    def __init__(self, data: Mapping | None = None):
        self._data: dict = copy.deepcopy(dict(data or {}))

    # -- mapping protocol -------------------------------------------------
    def __getitem__(self, key: str):
        val = self._data[key]
        return Config(val) if isinstance(val, dict) else val

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def __iter__(self):
        return iter(self._data)

    def keys(self):
        return self._data.keys()

    def items(self):
        for k, v in self._data.items():
            yield k, (Config(v) if isinstance(v, dict) else v)

    def to_dict(self) -> dict:
        return copy.deepcopy(self._data)

    def __repr__(self) -> str:
        return f"Config({self._data!r})"

    def __eq__(self, other) -> bool:
        if isinstance(other, Config):
            return self._data == other._data
        return self._data == other

    # -- dotted access -----------------------------------------------------
    def get(self, path: str, default: Any = None):
        """`cfg.get("a.b.c", default)`; plain keys work too."""
        node: Any = self._data
        for part in path.split("."):
            if isinstance(node, Mapping) and part in node:
                node = node[part]
            else:
                return default
        return Config(node) if isinstance(node, dict) else node

    def set(self, path: str, value: Any) -> None:
        parts = path.split(".")
        node = self._data
        for part in parts[:-1]:
            node = node.setdefault(part, {})
            if not isinstance(node, dict):
                raise TypeError(f"Cannot set {path}: {part} is not a mapping")
        node[parts[-1]] = value.to_dict() if isinstance(value, Config) else value

    def merged(self, other: "Config | Mapping") -> "Config":
        data = other.to_dict() if isinstance(other, Config) else dict(other)
        return Config(_deep_merge(self._data, data))

    def with_overrides(self, overrides: list[str] | None) -> "Config":
        cfg = Config(self._data)
        for item in overrides or []:
            if "=" not in item:
                raise ValueError(f"Override must be key=value, got: {item}")
            key, _, val = item.partition("=")
            cfg.set(key.strip(), _coerce(val.strip()))
        return cfg

    # -- IO -----------------------------------------------------------------
    @classmethod
    def from_yaml(cls, path: str | os.PathLike) -> "Config":
        with open(path, "r", encoding="utf-8") as f:
            return cls(yaml.safe_load(f) or {})

    @classmethod
    def from_string(cls, text: str) -> "Config":
        return cls(yaml.safe_load(io.StringIO(text)) or {})

    def save(self, path: str | os.PathLike) -> None:
        os.makedirs(os.path.dirname(os.fspath(path)) or ".", exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            yaml.safe_dump(self._data, f, sort_keys=False, allow_unicode=True)


def load_config(
    path: str | os.PathLike,
    base_path: str | os.PathLike | None = None,
    overrides: list[str] | None = None,
) -> Config:
    """Load a YAML config, optionally deep-merged over a base YAML.

    Reference behavior: each configs/ham/*.yml and configs/spine/*.yml file is
    a full standalone config (reference loads one file flat); we additionally
    support an in-file ``_base_: path`` key for config reuse.
    """
    cfg = Config.from_yaml(path)
    base_ref = cfg.get("_base_")
    if base_ref is not None:
        base_file = os.path.join(os.path.dirname(os.fspath(path)), base_ref)
        base = load_config(base_file)  # recursive: bases may chain
        data = cfg.to_dict()
        data.pop("_base_", None)
        cfg = base.merged(data)
    if base_path is not None:
        cfg = Config.from_yaml(base_path).merged(cfg.to_dict())
    return cfg.with_overrides(overrides)
