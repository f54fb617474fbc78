"""Metrics logging: JSONL always; TensorBoard when available.

Feature list mirrors the Backup trainer's TB logging (reference:
Backup/scripts/Modello_supporto.py:110-148): per-component losses,
learning rate, val PSNR/SSIM, preview images.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


class MetricsLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: dict[str, float],
                prefix: str = "") -> None:
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
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
