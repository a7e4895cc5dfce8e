"""Profiling/tracing helpers.

The reference has no profiler — only wall-clock ``now()`` prints
(SURVEY.md §5). The rebuild makes tracing first-class: ``trace()`` wraps
``jax.profiler`` (view with TensorBoard/xprof), ``Throughput`` provides
the lines/sec counters the train CLIs report.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace around a code block."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Sliding throughput meter (items/sec over the recent window)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.events: list = []  # (t, count)
        self.total = 0

    def add(self, n: int = 1) -> None:
        self.total += n
        self.events.append((time.time(), n))
        if len(self.events) > self.window:
            self.events.pop(0)

    def rate(self) -> float:
        if len(self.events) < 2:
            return 0.0
        dt = self.events[-1][0] - self.events[0][0]
        n = sum(c for _, c in self.events[1:])
        return n / dt if dt > 0 else 0.0


class Timer:
    """Reference utils.h ``now()``-style wall-clock timing."""

    def __init__(self):
        self.t0 = time.time()

    def elapsed(self) -> float:
        return time.time() - self.t0
