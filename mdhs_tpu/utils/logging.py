"""Run-dir setup, python logging, and metric writers.

Parity with reference scripts/train.py:73-91 (file+console logging),
:136-155 (timestamped run dir + config snapshot), :158/:393-409
(TensorBoard scalars). Metrics always go to a JSONL file; TensorBoard is
used when torch.utils.tensorboard is importable.
"""

from __future__ import annotations

import json
import logging
import os
from datetime import datetime
from typing import Optional


def setup_run_dir(log_dir: str, run_name: str) -> str:
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    out = os.path.join(log_dir, f"{run_name}_{timestamp}")
    os.makedirs(out, exist_ok=True)
    return out


def setup_logging(output_dir: str) -> None:
    log_path = os.path.join(output_dir, "training.log")
    logger = logging.getLogger()
    logger.setLevel(logging.INFO)
    for h in logger.handlers[:]:
        logger.removeHandler(h)
    fh = logging.FileHandler(log_path, mode="w")
    fh.setFormatter(logging.Formatter("%(asctime)s - %(levelname)s - %(message)s"))
    ch = logging.StreamHandler()
    ch.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(fh)
    logger.addHandler(ch)


class MetricWriter:
    """JSONL scalar log + optional TensorBoard."""

    def __init__(self, output_dir: str, tensorboard: bool = True):
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=os.path.join(output_dir, "tensorboard"))
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._f.closed:  # post-fit reports (e.g. ad-hoc validation) reopen
            self._f = open(self.path, "a")
        self._f.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
