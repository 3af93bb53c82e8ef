"""Structured tracing / profiling.

The reference logs ad-hoc std::chrono spans through ROS
(top_down_render.cpp:416-428, 546-548).  Here: a step timer with named
spans plus jax.profiler integration for device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


class StepTimer:
    """Accumulates wall-clock spans per name; mean/last accessors."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.last: Dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            self.last[name] = dt

    def mean_ms(self, name: str) -> float:
        c = self.counts.get(name, 0)
        return 1e3 * self.totals[name] / c if c else 0.0

    def report(self) -> str:
        return " | ".join(
            f"{k}: {self.mean_ms(k):.1f}ms" for k in sorted(self.totals)
        )


@contextlib.contextmanager
def trace_span(name: str) -> Iterator[None]:
    """jax.profiler annotation (shows up in TensorBoard/perfetto traces
    when a profiler session is active)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
