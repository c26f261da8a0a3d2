"""Profiling / tracing hooks.

The reference's observability is hand-rolled wall-clock meters and NFE
prints (SURVEY.md §5). Here the same counters exist in the trainers, plus
first-class `jax.profiler` integration for real device traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/XProf.

    Usage:
        with profiling.trace("/tmp/ldt_trace"):
            trainer.update(batch)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span (shows up in the device timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step-time / throughput meter (the reference's "Sample rate"
    and "NFE/s" prints, trainer/Latent_SDE_Trainer.py:206,
    trainer/Hybrid_Trainer.py:182)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now
        return self.step_time

    @property
    def step_time(self) -> Optional[float]:
        if not self.times:
            return None
        return sum(self.times) / len(self.times)

    def rate(self, items_per_step: int) -> Optional[float]:
        st = self.step_time
        return items_per_step / st if st else None
