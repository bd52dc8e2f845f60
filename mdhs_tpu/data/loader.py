"""Batched host loader with weighted sampling and background prefetch.

Replaces torch DataLoader + WeightedRandomSampler (reference
data_loader.py:317-429). Batches are dicts of stacked numpy arrays with
STATIC shapes (uint8 canvases; augmentation/normalization happens on
device in mdhs_tpu.ops). A background thread overlaps PIL decode with
device compute (the reference used 4 worker processes; this host has the
decode budget of a thread pool and the TPU does the rest).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


def class_balanced_weights(labels, num_classes: int) -> np.ndarray:
    """per-sample weights total/(num_classes*count) (reference :407-419)."""
    counts = np.zeros(num_classes, np.float64)
    for l in labels:
        if 0 <= l < num_classes:
            counts[l] += 1
    total = max(1, len(labels))
    per_class = np.where(counts > 0, total / (num_classes * np.maximum(counts, 1)), 0.0)
    return np.asarray([per_class[l] if 0 <= l < num_classes else 0.0 for l in labels])


def _stack(records: list[dict]) -> dict:
    out = {}
    for key in records[0]:
        vals = [r[key] for r in records]
        if key == "image_id":
            out[key] = vals
        else:
            out[key] = np.stack(vals)
    return out


class DataLoader:
    """Iterates epoch batches. shuffle XOR weighted sampling for train;
    sequential with tail padding (+n_valid) for eval."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        weighted: bool = False,
        num_classes: int = 0,
        seed: int = 0,
        drop_last: bool = False,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.weighted = weighted
        self.num_classes = num_classes
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.weighted:
            w = class_balanced_weights(self.dataset.labels, self.num_classes)
            p = w / w.sum()
            return self._rng.choice(n, size=n, replace=True, p=p)
        idx = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[dict]:
        idx = self._indices()
        n = len(idx)
        bs = self.batch_size

        def gen():
            for start in range(0, n, bs):
                chunk = idx[start : start + bs]
                if len(chunk) < bs:
                    if self.drop_last:
                        return
                    # pad by repeating the first record; n_valid marks reality
                    pad = np.concatenate([chunk, np.repeat(chunk[:1], bs - len(chunk))])
                    batch = _stack([self.dataset[i] for i in pad])
                    batch["n_valid"] = np.int32(len(chunk))
                else:
                    batch = _stack([self.dataset[i] for i in chunk])
                    batch["n_valid"] = np.int32(bs)
                yield batch

        if self.prefetch <= 0:
            yield from gen()
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        DONE = object()
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that gives up when the consumer abandoned the
            # epoch (break / exception mid-iteration) — otherwise the
            # worker would block on the full queue forever, leaking the
            # thread and prefetch+1 decoded batches
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            # A mid-epoch dataset failure must surface in the consumer, not
            # silently truncate the epoch: ship the exception over the queue.
            try:
                for b in gen():
                    if not put(b):
                        return
                put(DONE)
            except BaseException as exc:  # noqa: BLE001 - re-raised below
                put(exc)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is DONE:
                    break
                if isinstance(b, BaseException):
                    raise b
                yield b
        finally:
            stop.set()
