"""TensorBoard + console logging.

Equivalent of save_scalars/save_images (/root/reference/utils.py:70-102):
scalars under '{mode}/{key}', image summaries normalized per image. Uses
tensorboardX when available, else writes a JSONL scalars log so training
remains observable in minimal environments.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import numpy as np


class SummaryLogger:
    def __init__(self, logdir: str) -> None:
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a")
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(logdir)
        except Exception:
            self._tb = None

    def save_scalars(self, mode: str, scalars: dict[str, float], step: int) -> None:
        rec = {"mode": mode, "step": int(step), "time": time.time()}
        for key, value in scalars.items():
            if isinstance(value, (list, tuple)):
                for i, v in enumerate(value):
                    rec[f"{key}_{i}"] = float(v)
                    if self._tb:
                        self._tb.add_scalar(f"{mode}/{key}_{i}", float(v), step)
            else:
                rec[key] = float(value)
                if self._tb:
                    self._tb.add_scalar(f"{mode}/{key}", float(value), step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    @staticmethod
    def _to_grid(img: np.ndarray) -> np.ndarray:
        """First batch element, normalized to [0,1], as HWC float."""
        img = np.asarray(img)
        if img.ndim == 4:  # [B,H,W,C] or [B,C,H,W] -> take first, assume HWC
            img = img[0]
        if img.ndim == 2:
            img = img[..., None]
        if img.ndim == 3 and img.shape[-1] not in (1, 3):
            # channels-first fallback
            img = np.moveaxis(img, 0, -1)
        lo, hi = np.min(img), np.max(img)
        if hi > lo:
            img = (img - lo) / (hi - lo)
        return img.astype(np.float32)

    def save_images(self, mode: str, images: dict[str, Any], step: int) -> None:
        if self._tb is None:
            return
        for key, value in images.items():
            grid = self._to_grid(value)
            self._tb.add_image(f"{mode}/{key}", grid, step, dataformats="HWC")
        self._tb.flush()

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb:
            self._tb.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb:
            self._tb.close()
