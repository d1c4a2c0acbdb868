"""Metric writers: TensorBoard / Weights&Biases / JSONL fallback.

Capability parity with madrona_learn's TensorboardWriter / WandbWriter
(reference usage: jax_train.py:86-89, 215-222). Backends are optional: if
neither tensorboard nor wandb is importable the writer degrades to a JSONL
stream so headless training environments still record metrics.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class _JsonlBackend:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def scalar(self, key, value, step):
        self._f.write(json.dumps(
            {"t": time.time(), "step": int(step), key: float(value)}) + "\n")

    def flush(self):
        self._f.flush()


class TensorboardWriter:
    """TensorBoard scalar writer; JSONL fallback when unavailable."""

    def __init__(self, log_dir: str, force_jsonl: bool = False):
        self.log_dir = log_dir
        self._backend = None
        if force_jsonl or os.environ.get("MHS_METRICS_JSONL"):
            self._backend = _JsonlBackend(log_dir)
            self._mode = "jsonl"
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._backend = SummaryWriter(log_dir=log_dir)
            self._mode = "tb"
        except Exception:
            self._backend = _JsonlBackend(log_dir)
            self._mode = "jsonl"

    def scalar(self, key: str, value: float, step: int):
        if self._mode == "tb":
            self._backend.add_scalar(key, value, step)
        else:
            self._backend.scalar(key, value, step)

    def flush(self):
        self._backend.flush()


class WandbWriter:
    """Weights&Biases writer; JSONL fallback when wandb is unavailable."""

    def __init__(self, log_dir: str, args=None):
        self.log_dir = log_dir
        try:
            import wandb

            wandb.init(project=os.path.basename(log_dir) or "hideseek",
                       config=vars(args) if args else None)
            self._wandb = wandb
        except Exception:
            self._wandb = None
            self._fallback = _JsonlBackend(log_dir)

    def scalar(self, key: str, value: float, step: int):
        if self._wandb is not None:
            self._wandb.log({key: value}, step=step)
        else:
            self._fallback.scalar(key, value, step)

    def flush(self):
        if self._wandb is None:
            self._fallback.flush()
