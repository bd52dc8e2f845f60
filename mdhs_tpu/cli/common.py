"""Shared CLI plumbing: config load, trainer construction, prediction loop."""

from __future__ import annotations

import csv
import os
from typing import Optional

import numpy as np

from ..core.config import Config, load_config
from ..train.trainer import Trainer


def build_trainer(config_path: str, family: str = "baseline", overrides=None,
                  setup_data: bool = True, output_dir: Optional[str] = None) -> Trainer:
    cfg = load_config(config_path, overrides=overrides)
    return Trainer(cfg, family=family, output_dir=output_dir, setup_data=setup_data)


def run_prediction(trainer: Trainer, loader, *, tta_cfg=None, ablation_mode=None):
    """Returns (image_ids, predictions, logits) over a loader."""
    tta_enabled = bool(tta_cfg and tta_cfg.get("enabled"))
    transforms = tuple((tta_cfg.get("transforms", ["hflip"]) if tta_cfg else []) or [])
    step = trainer.eval_step_fn(
        ablation_mode=ablation_mode, tta=tta_enabled, tta_transforms=transforms
    )
    ids, preds, all_logits = [], [], []
    for batch in loader:
        # _device_batch shards the batch axis over the mesh data axis (and
        # builds the global array under multi-process); plain jnp.asarray
        # would feed replicated inputs on a >1-device mesh.
        jb = trainer._device_batch(batch)
        logits = np.asarray(step(trainer.state, jb), np.float32)
        n = int(batch["n_valid"])
        ids.extend(batch["image_id"][:n])
        preds.extend(logits[:n].argmax(-1).tolist())
        all_logits.append(logits[:n])
    return ids, preds, np.concatenate(all_logits, axis=0)


def write_submission(path: str, image_ids, predictions) -> None:
    """submission CSV `image_id,predicted_label` (reference predict.py:168-178)."""
    out_dir = os.path.dirname(path)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["image_id", "predicted_label"])
        for i, p in zip(image_ids, predictions):
            w.writerow([i, int(p)])
