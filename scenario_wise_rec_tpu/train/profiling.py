"""Tracing / profiling instrumentation (SURVEY §5.1).

The reference has no profiling at all (tqdm rate display only,
ctr_trainer.py:65). Here:

- :class:`StepTimer` — per-step wall-time ring buffer with examples/s
  summary; negligible overhead (perf_counter + deque append).
- :func:`trace` — context manager around ``jax.profiler`` trace capture
  writing a TensorBoard-loadable trace directory.
- :func:`annotate` — named TraceAnnotation for marking phases inside a step.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional

import jax


class StepTimer:
    """Tracks step wall-times; ``summary()`` reports throughput."""

    def __init__(self, batch_size: int, window: int = 200):
        self.batch_size = batch_size
        self.times = deque(maxlen=window)
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    @property
    def mean_step_s(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def examples_per_s(self) -> float:
        m = self.mean_step_s
        return self.batch_size / m if m else 0.0

    def summary(self) -> dict:
        return {
            "steps": len(self.times),
            "mean_step_ms": round(self.mean_step_s * 1e3, 3),
            "examples_per_s": round(self.examples_per_s, 1),
        }


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation appearing in profiler traces."""
    return jax.profiler.TraceAnnotation(name)
