"""Observability: scalar/image logging with the reference's tensorboard tag
names (reference trainer.py:336-360,417-444), plus an always-on JSONL stream
(machine-readable, survives without tensorboard)."""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


class MetricsLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value, step: int):
        value = float(np.asarray(value))
        self._jsonl.write(
            json.dumps({"tag": tag, "value": value, "step": int(step), "ts": time.time()})
            + "\n"
        )
        if self._tb:
            self._tb.add_scalar(tag, value, step)

    def add_scalars(self, scalars: dict, step: int):
        for tag, value in scalars.items():
            self.add_scalar(tag, value, step)

    def add_image(self, tag: str, image_hwc: np.ndarray, step: int):
        """image: uint8 HWC."""
        path = os.path.join(self.log_dir, f"{tag.replace('/', '_')}_{step:05d}.png")
        try:
            from PIL import Image

            Image.fromarray(image_hwc).save(path)
        except Exception:
            pass
        if self._tb:
            self._tb.add_image(tag, image_hwc.transpose(2, 0, 1) / 255.0, step)

    def flush(self):
        self._jsonl.flush()
        if self._tb:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb:
            self._tb.close()
