"""Tracing + metrics.

Reference: OpenTelemetry spans under ARROW_WITH_OPENTELEMETRY
(``util/tracing_internal.h:25-129``; ``START_COMPUTE_SPAN`` in kernels,
TracedNode in acero) and ad-hoc counters.

TPU-native: ``trace_span`` wraps ``jax.profiler.TraceAnnotation`` +
``jax.named_scope`` so spans show up both in host timelines and inside
XLA-compiled regions of the profiler; a process-wide ``Metrics`` registry
accumulates per-operator rows/s counters (the conbench-style numbers the
reference tracks externally). Enable the on-disk profiler trace with
``ARROW_TPU_TRACE_DIR`` (ARROW_TRACING_BACKEND analog).
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from typing import Dict, Optional

__all__ = ["trace_span", "metrics", "Metrics", "start_profiler",
           "stop_profiler"]


class _Counter:
    __slots__ = ("calls", "rows", "seconds")

    def __init__(self):
        self.calls = 0
        self.rows = 0
        self.seconds = 0.0

    @property
    def rows_per_sec(self) -> float:
        return self.rows / self.seconds if self.seconds > 0 else 0.0


class Metrics:
    """Per-operator counters (name -> calls / rows / wall seconds)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._counters: Dict[str, _Counter] = {}

    def record(self, name: str, rows: int, seconds: float):
        with self._lock:
            c = self._counters.setdefault(name, _Counter())
            c.calls += 1
            c.rows += rows
            c.seconds += seconds

    def snapshot(self) -> Dict[str, dict]:
        with self._lock:
            return {k: {"calls": c.calls, "rows": c.rows,
                        "seconds": round(c.seconds, 6),
                        "rows_per_sec": round(c.rows_per_sec, 1)}
                    for k, c in sorted(self._counters.items())}

    def reset(self):
        with self._lock:
            self._counters.clear()


metrics = Metrics()


@contextlib.contextmanager
def trace_span(name: str, rows: Optional[int] = None):
    """Span visible to jax.profiler + accumulated into `metrics`.

    Note: jitted work is async — wall time here measures dispatch unless
    the caller blocks; engine nodes record spans around blocking
    boundaries (materialization, host sync)."""
    import jax
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name), jax.named_scope(name):
        yield
    if rows is not None:
        metrics.record(name, rows, time.perf_counter() - t0)


_profiler_started = False


def start_profiler(log_dir: Optional[str] = None) -> Optional[str]:
    """Start the jax profiler trace (ARROW_TRACING_BACKEND analog)."""
    global _profiler_started
    import jax
    log_dir = log_dir or os.environ.get("ARROW_TPU_TRACE_DIR")
    if not log_dir or _profiler_started:
        return None
    jax.profiler.start_trace(log_dir)
    _profiler_started = True
    return log_dir


def stop_profiler():
    global _profiler_started
    import jax
    if _profiler_started:
        jax.profiler.stop_trace()
        _profiler_started = False
