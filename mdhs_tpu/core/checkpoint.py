"""Checkpoint manager with top-k retention.

Parity with the reference's checkpointing semantics:
- top-3-by-val-acc retention with eviction of the worst
  (reference scripts/train.py:412-430)
- last + best files (reference mibf_net/train_resnet.py:153-157)
- tolerant loading: missing/unexpected keys are warned about, matching
  shapes are loaded (reference mibf_net/predict_resnet.py:13-23,
  scripts/train.py:227-236 strict=False resume)

Storage is flax msgpack serialization of {params, batch_stats, kan_state,
opt_state?, step, metadata}; filenames embed epoch and metric like the
reference ("epoch_{n}_val_acc_{acc}.msgpack").
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Optional

import flax
import jax
import numpy as np

log = logging.getLogger(__name__)


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = flax.serialization.msgpack_serialize(_to_host(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def merge_tolerant(target: dict, loaded: dict, prefix: str = "",
                   warn_missing: bool = True) -> dict:
    """strict=False-style merge: copy leaves whose path+shape match; warn on
    missing/unexpected/mismatched (reference predict_resnet.py:13-23).
    warn_missing=False silences the target-keys-not-in-checkpoint warnings
    (used for tower-subtree merges, where most of the tree is absent by
    design)."""
    import flax.traverse_util as tu

    t_flat = tu.flatten_dict(target, sep="/")
    l_flat = tu.flatten_dict(loaded, sep="/")
    merged = dict(t_flat)
    loaded_keys = set()
    for key, val in l_flat.items():
        if key in t_flat:
            tgt = t_flat[key]
            if getattr(tgt, "shape", None) == getattr(val, "shape", None):
                merged[key] = np.asarray(val).astype(getattr(tgt, "dtype", val.dtype))
                loaded_keys.add(key)
            else:
                log.warning("shape mismatch for %s%s: %s vs %s", prefix, key,
                            getattr(val, "shape", None), getattr(tgt, "shape", None))
        else:
            log.warning("unexpected key in checkpoint: %s%s", prefix, key)
    if warn_missing:
        for key in t_flat:
            if key not in loaded_keys and key not in l_flat:
                log.warning("missing key in checkpoint: %s%s", prefix, key)
    return tu.unflatten_dict(merged, sep="/")


class TopKCheckpointManager:
    """Keeps the k best checkpoints by a scalar metric (higher is better)."""

    def __init__(self, output_dir: str, k: int = 3, prefix: str = "epoch"):
        self.output_dir = output_dir
        self.k = k
        self.prefix = prefix
        self.entries: list[tuple[float, str]] = []  # (metric, path), best first
        os.makedirs(output_dir, exist_ok=True)
        # resume into the same run dir: reload the index so retention keeps
        # evicting across restarts and best_path() sees pre-restart saves
        idx = os.path.join(output_dir, "checkpoints.json")
        if os.path.exists(idx):
            try:
                with open(idx) as f:
                    for e in json.load(f):
                        p = os.path.join(output_dir, e["path"])
                        if os.path.exists(p):
                            self.entries.append((float(e["metric"]), p))
                self.entries.sort(key=lambda e: e[0], reverse=True)
            except (ValueError, KeyError, TypeError) as exc:
                # TypeError: corrupt index values (e.g. "metric": null) or a
                # non-list JSON document; resume must tolerate these too.
                log.warning("ignoring unreadable checkpoints.json: %s", exc)

    def maybe_save(self, epoch: int, metric: float, state: dict) -> Optional[str]:
        is_topk = len(self.entries) < self.k or metric > min(e[0] for e in self.entries)
        if not is_topk:
            return None
        path = os.path.join(
            self.output_dir, f"{self.prefix}_{epoch}_val_acc_{metric:.2f}.msgpack"
        )
        save_checkpoint(path, state)
        while len(self.entries) >= self.k:
            worst = min(self.entries, key=lambda e: e[0])
            if os.path.exists(worst[1]):
                os.remove(worst[1])
            self.entries.remove(worst)
        self.entries.append((metric, path))
        self.entries.sort(key=lambda e: e[0], reverse=True)
        self._write_index()
        return path

    def save_last(self, state: dict) -> str:
        path = os.path.join(self.output_dir, "last.msgpack")
        save_checkpoint(path, state)
        return path

    def best_path(self) -> Optional[str]:
        return self.entries[0][1] if self.entries else None

    def _write_index(self):
        index = [{"metric": m, "path": os.path.basename(p)} for m, p in self.entries]
        path = os.path.join(self.output_dir, "checkpoints.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(index, f, indent=2)
        os.replace(tmp, path)
