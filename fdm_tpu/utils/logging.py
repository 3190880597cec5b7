"""Structured training metrics: JSONL stream + optional TensorBoard.

Replaces the reference's SummaryWriter scalar streams
(train/train_diffusion_mead.py:54,109-111) with an always-available JSONL
writer; TensorBoard output is attached when a writer backend is importable
(tensorboardX / torch.utils.tensorboard), since TF isn't guaranteed.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricLogger:
    def __init__(self, log_dir: str, run_name: str = "run",
                 tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{run_name}.jsonl")
        self._fh = open(self.path, "a", buffering=1)
        self._tb = None
        if tensorboard:
            self._tb = _try_tensorboard(os.path.join(log_dir, run_name))

    def log_step(self, step: int, metrics: dict):
        self._write({"kind": "step", "step": step, **metrics})
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"step/{k}", v, step)

    def log_epoch(self, epoch: int, metrics: dict):
        self._write({"kind": "epoch", "epoch": epoch, **metrics})
        if self._tb is not None:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(f"epoch/{k}", v, epoch)

    def _write(self, record: dict):
        record["time"] = time.time()
        self._fh.write(json.dumps(record) + "\n")

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()


def _try_tensorboard(path: str):
    try:
        from torch.utils.tensorboard import SummaryWriter  # type: ignore

        return SummaryWriter(path)
    except Exception:
        return None
