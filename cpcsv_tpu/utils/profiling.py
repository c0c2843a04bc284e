"""Tracing / profiling (SURVEY §5: the reference has only wall-clock epoch
timers, trainer.py:240-241 — here: jax.profiler traces + per-step timers).

Enable a trace of training steps with env CPCSV_PROFILE_DIR=/path (the
trainer traces steps [profile_start, profile_start+profile_steps)), viewable
in TensorBoard's profile plugin / Perfetto.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax


@contextlib.contextmanager
def maybe_trace(log_dir: str | None):
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall-clock stats (device-synced on read)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._t0 = None
        self._count = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None):
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self._count += 1
        if self._count > self.warmup and self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    def frames_per_sec(self, frames_per_step: int) -> float:
        return frames_per_step / self.mean if self.times else float("nan")


def profile_env_dir() -> str | None:
    return os.environ.get("CPCSV_PROFILE_DIR") or None
