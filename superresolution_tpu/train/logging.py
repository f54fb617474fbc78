"""Metrics logging: JSONL always; TensorBoard when available.

Feature list mirrors the Backup trainer's TB logging (reference:
Backup/scripts/Modello_supporto.py:110-148): per-component losses,
learning rate, val PSNR/SSIM, preview images.
"""

from __future__ import annotations

import json
import os
import time
import weakref

import numpy as np

# Live loggers, so a harness (tests/conftest.py) can deterministically
# close any writer a test forgot — each TB SummaryWriter owns background
# threads, and dozens of leaked writers in one pytest process contributed
# to the round-4 full-suite SIGABRT.
_OPEN_LOGGERS: "weakref.WeakSet[MetricsLogger]" = weakref.WeakSet()


def close_all_open_loggers() -> None:
    for lg in list(_OPEN_LOGGERS):
        lg.close()


class MetricsLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard and not os.environ.get("SRTPU_NO_TB"):
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None
        _OPEN_LOGGERS.add(self)

    def scalars(self, step: int, values: dict[str, float],
                prefix: str = "") -> None:
        if self._jsonl.closed:  # harness closed us between fits: reopen
            self._jsonl = open(os.path.join(self.dir, "metrics.jsonl"), "a")
            _OPEN_LOGGERS.add(self)
        rec = {"step": step, "time": time.time()}
        for k, v in values.items():
            name = f"{prefix}{k}" if prefix else k
            rec[name] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(name, float(v), step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def image(self, step: int, name: str, img: np.ndarray) -> None:
        """img: HWC float [0,1]."""
        if self._tb is not None:
            self._tb.add_image(name, np.transpose(
                np.asarray(img, np.float32), (2, 0, 1)), step)

    def close(self) -> None:
        if not self._jsonl.closed:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
            self._tb = None
        _OPEN_LOGGERS.discard(self)
