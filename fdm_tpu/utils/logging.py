"""Structured training metrics: JSONL stream + TensorBoard event files.

Replaces the reference's SummaryWriter scalar streams
(train/train_mead_vqvae.py:100-102, train/train_diffusion_mead.py:109-111)
with an always-available JSONL writer plus a dependency-free TensorBoard
event writer (fdm_tpu.utils.tb_events) so `tensorboard --logdir` works on
the run directory exactly like it does for the reference trainers.
"""

from __future__ import annotations

import json
import math
import os
import time


def _to_py(v):
    """numpy/jax scalar (or 0-d array) -> Python scalar; everything else
    passes through. Without this, np.float32 metrics dodge the NaN guard
    (isinstance(np.float32(x), float) is False), vanish from TensorBoard,
    and kill the run at json.dumps."""
    item = getattr(v, "item", None)
    if item is not None and getattr(v, "ndim", 0) == 0:
        return item()
    return v


class MetricLogger:
    def __init__(self, log_dir: str, run_name: str = "run",
                 tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{run_name}.jsonl")
        self._fh = open(self.path, "a", buffering=1)
        self._tb = None
        if tensorboard:
            from fdm_tpu.utils.tb_events import EventFileWriter

            self._tb = EventFileWriter(os.path.join(log_dir, run_name))

    def log_step(self, step: int, metrics: dict):
        metrics = {k: _to_py(v) for k, v in metrics.items()}
        self._write({"kind": "step", "step": step, **metrics})
        if self._tb is not None:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(f"step/{k}", v, step)
            self._tb.flush()

    def log_epoch(self, epoch: int, metrics: dict):
        metrics = {k: _to_py(v) for k, v in metrics.items()}
        self._write({"kind": "epoch", "epoch": epoch, **metrics})
        if self._tb is not None:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(f"epoch/{k}", v, epoch)
            self._tb.flush()

    def _write(self, record: dict):
        record["time"] = time.time()
        # json.dumps would emit bare NaN/Infinity tokens (invalid JSON) for
        # non-finite floats — e.g. val_recon=nan from an empty eval split.
        # Serialize them as null so every line stays strictly parseable.
        record = {
            k: (
                None
                if isinstance(v, float) and not math.isfinite(v) else v
            )
            for k, v in record.items()
        }
        self._fh.write(json.dumps(record, allow_nan=False) + "\n")

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()
