"""Persistent serving runtime for exported AOT artifacts.

`cli.export_serving.load_and_run` is the one-shot loader (deserialize +
call); a serving *process* must not pay its costs per request:

  - deserialize the StableHLO once (~seconds for a production tower);
  - keep the weight tree device-resident (542 MB for MIBF ResNet50+BERT —
    re-uploading it per call through the relay was the dominant cost of the
    naive loop);
  - overlap the next request's host->device batch transfer with the current
    call's compute (JAX dispatch is async; the only synchronization point
    is fetching result bytes, so a bounded in-flight queue pipelines
    transfer/compute/fetch across requests);
  - pad partial batches to the artifact's static batch size and slice the
    logits back (XLA shapes are frozen at export).

Reference serving loop being exceeded: /root/reference/scripts/predict.py:
44-81 — a Python per-batch loop over a live torch model (H2D, forward,
argmax per iteration, no overlap). Measured effect of this runtime on-chip
(benchmarks/serving_artifact_check.py): see docs/PARITY.md int8 row.
"""

from __future__ import annotations

import json
import zipfile
from collections import deque

import jax
import numpy as np
from jax import export as jax_export

from .cli.export_serving import _FORMAT


class ServingModel:
    """A loaded serving artifact: weights device-resident, executable reused.

    Use `ServingModel.load(path)` once per process, then `predict(batch)`
    for synchronous calls or `predict_stream(batches)` for a pipelined
    request loop. Batches are dicts of numpy arrays matching the artifact's
    input spec; the leading dimension may be <= the exported batch size
    (padded internally, logits sliced back).
    """

    def __init__(self, exported, weights, input_spec):
        self._exported = exported
        # Weights ride as the first runtime argument (v2 artifacts). v1
        # artifacts baked them into the StableHLO as constants.
        self._weights = (
            None if weights is None else [jax.device_put(w) for w in weights]
        )
        self.input_spec = input_spec  # {name: (shape tuple, dtype str)}
        self.batch_size = next(iter(input_spec.values()))[0][0]
        if self._weights is None:
            self._call = jax.jit(lambda b: exported.call(b))
        else:
            self._call = jax.jit(lambda w, b: exported.call(w, b))

    # ------------------------------------------------------------------
    @classmethod
    def load(cls, path: str) -> "ServingModel":
        if zipfile.is_zipfile(path):
            with zipfile.ZipFile(path) as z:
                meta = json.loads(z.read("meta.json"))
                if meta["format"] != _FORMAT:
                    raise ValueError(
                        f"unsupported serving artifact format "
                        f"{meta['format']!r} (expected {_FORMAT!r})"
                    )
                exported = jax_export.deserialize(bytearray(z.read("fn.bin")))
                weights = [
                    np.frombuffer(z.read(f"leaf_{i:05d}"),
                                  dtype=np.dtype(m["dtype"])).reshape(m["shape"])
                    for i, m in enumerate(meta["leaves"])
                ]
            spec = {k: (tuple(v[0]), v[1]) for k, v in meta["inputs"].items()}
            return cls(exported, weights, spec)
        # v1: raw Exported blob, weights as baked constants; recover the
        # input spec from the Exported's own avals.
        with open(path, "rb") as f:
            exported = jax_export.deserialize(bytearray(f.read()))
        tree = jax.tree_util.tree_unflatten(
            exported.in_tree, list(exported.in_avals)
        )
        (batch_tree,) = tree[0] if isinstance(tree, tuple) else (tree,)
        spec = {
            k: (tuple(v.shape), str(v.dtype)) for k, v in batch_tree.items()
        }
        return cls(exported, None, spec)

    # ------------------------------------------------------------------
    def _pad(self, batch: dict):
        """Zero-pad a partial batch to the static exported batch size."""
        n = int(next(iter(batch.values())).shape[0])
        if n > self.batch_size:
            raise ValueError(
                f"batch of {n} exceeds exported batch size {self.batch_size}"
            )
        out = {}
        for k, (shape, dtype) in self.input_spec.items():
            if k not in batch:
                raise KeyError(f"serving batch missing input {k!r}")
            v = np.ascontiguousarray(batch[k], dtype=np.dtype(dtype))
            if v.shape[1:] != shape[1:]:
                raise ValueError(
                    f"input {k!r} has shape {v.shape}, artifact expects "
                    f"(<= {self.batch_size},) + {shape[1:]}"
                )
            if n < self.batch_size:
                pad = np.zeros((self.batch_size - n,) + shape[1:], v.dtype)
                v = np.concatenate([v, pad], axis=0)
            out[k] = v
        return out, n

    def _dispatch(self, batch: dict):
        """Start one call: begin H2D transfers, enqueue the executable.

        Returns (device logits, n_valid) without synchronizing — callers
        fetch with np.asarray when they need the bytes.
        """
        padded, n = self._pad(batch)
        dev = {k: jax.device_put(v) for k, v in padded.items()}
        if self._weights is None:
            return self._call(dev), n
        return self._call(self._weights, dev), n

    # ------------------------------------------------------------------
    def predict(self, batch: dict) -> np.ndarray:
        """Synchronous single call: logits for the batch's valid rows."""
        out, n = self._dispatch(batch)
        return np.asarray(out)[:n]

    def predict_stream(self, batches, depth: int = 2):
        """Pipelined serving loop: yields logits per input batch, in order.

        Keeps up to `depth` calls in flight so batch k+1's host->device
        transfer and dispatch RPC overlap batch k's compute — the win over
        the naive fetch-per-call loop is the entire per-call transport
        latency (measured on-chip in benchmarks/serving_artifact_check.py).
        `depth=0` degrades to the synchronous loop.
        """
        inflight = deque()
        for batch in batches:
            inflight.append(self._dispatch(batch))
            while len(inflight) > max(int(depth), 0):
                out, n = inflight.popleft()
                yield np.asarray(out)[:n]
        while inflight:
            out, n = inflight.popleft()
            yield np.asarray(out)[:n]
