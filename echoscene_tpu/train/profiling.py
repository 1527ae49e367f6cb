"""Profiling + numerics-debugging utilities.

The reference has essentially no tracing (SURVEY.md §5: a dormant profiler
import and commented-out wall-clock code).  Here:
  * `profile_trace(dir)` context: captures a jax.profiler trace (TensorBoard-
    viewable) around a training window,
  * `StepTimer`: wall-clock per-step timing with scenes/sec/chip — the
    north-star counter,
  * `enable_nan_debugging()`: jax_debug_nans, the analog of the reference's
    torch.autograd.set_detect_anomaly + NaN guards (train_3dfront.py:210,
    255-259) — note the TRAIN STEP itself already zeroes NaN grads to match
    the reference's runtime behavior; this switch is for debugging.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging():
    jax.config.update("jax_debug_nans", True)


class StepTimer:
    """Rolling wall-clock step timing; reports scenes/sec/chip."""

    def __init__(self, scenes_per_step: int, window: int = 50):
        self.scenes = scenes_per_step
        self.window = window
        self._t0: Optional[float] = None
        self._times = []

    def tick(self):
        now = time.perf_counter()
        if self._t0 is not None:
            self._times.append(now - self._t0)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._t0 = now

    @property
    def step_seconds(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    @property
    def scenes_per_sec(self) -> float:
        s = self.step_seconds
        n = jax.device_count()
        return self.scenes / s / max(n, 1) if s else 0.0
