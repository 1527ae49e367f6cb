"""Small host utilities.

Roles covered from the reference: FreeMemLinux /proc/meminfo reader
(helpers/psutil.py:1-83), seed_everything (model/diff_utils/util.py:100-108),
tensor->image conversion (util.py:21).
"""
from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np


class FreeMemLinux:
    """Read /proc/meminfo (helpers/psutil.py)."""

    def __init__(self, unit: str = "GB"):
        self.div = {"KB": 1.0, "MB": 1024.0, "GB": 1024.0 ** 2}[unit.upper()]

    def _read(self, key: str) -> float:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith(key + ":"):
                    return float(line.split()[1]) / self.div
        return 0.0

    @property
    def total(self) -> float:
        return self._read("MemTotal")

    @property
    def available(self) -> float:
        return self._read("MemAvailable")

    @property
    def user_free(self) -> float:
        return self.available


def seed_everything(seed: int):
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)


def tensor2im(arr: np.ndarray) -> np.ndarray:
    """(H, W, C) float [0,1] or [-1,1] -> uint8 image."""
    a = np.asarray(arr, np.float32)
    if a.min() < 0:
        a = (a + 1) / 2
    return np.clip(a * 255.0, 0, 255).astype(np.uint8)
