"""Profiling and throughput metering (SURVEY.md section 5.1: first-class
steps/s and edges/s meters plus jax.profiler traces — absent in the reference).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["StepMeter", "trace_context"]


class StepMeter:
    """Rolling steps/s and edges/s meter for the training loop."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._edges: list[int] = []

    def tick(self, edges_in_batch: int = 0):
        self._times.append(time.perf_counter())
        self._edges.append(edges_in_batch)
        if len(self._times) > self.window + 1:
            self._times.pop(0)
            self._edges.pop(0)

    @property
    def steps_per_s(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / max(dt, 1e-9)

    @property
    def edges_per_s(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return sum(self._edges[1:]) / max(dt, 1e-9)


@contextlib.contextmanager
def trace_context(logdir: Optional[str]):
    """jax.profiler trace scope; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
