"""Profiling and step-timing instrumentation.

The reference has no tracing at all — wall-clock epoch timing only
(src/cgan.py:205,233-234). Here: ``jax.profiler`` trace capture around
training epochs (viewable in TensorBoard/Perfetto/XProf) and a
lightweight step timer that publishes images/sec to the metric stream.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str | None):
    """Capture a jax.profiler trace into ``logdir`` (no-op when None)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock throughput over a window of steps."""

    def __init__(self):
        self._t0 = time.perf_counter()
        self._images = 0

    def update(self, n_images: int) -> None:
        self._images += n_images

    def rate(self) -> float:
        """images/sec since the last reset."""
        dt = time.perf_counter() - self._t0
        return self._images / dt if dt > 0 else 0.0

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._images = 0
