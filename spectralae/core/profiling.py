"""Tracing / profiling / metrics (SURVEY.md §5.1, §5.5).

The reference has only commented-out chrono timers and ``cout`` MSE prints.
Here: a ``jax.profiler`` trace context for device-level traces, a per-step
wall-clock timer with rolling stats, and a structured metrics logger
(stdout + JSONL), used by the CLI train loop and benchmarks.
"""

from __future__ import annotations

import contextlib
import json
import statistics
import time
from collections import deque
from pathlib import Path
from typing import IO

import jax


@contextlib.contextmanager
def device_trace(logdir: str | Path):
    """Capture a jax.profiler device trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall-clock stats (ms)."""

    def __init__(self, window: int = 100):
        self._times: deque[float] = deque(maxlen=window)
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._times.append(time.perf_counter() - self._t0)

    @property
    def last_ms(self) -> float:
        return self._times[-1] * 1e3 if self._times else float("nan")

    @property
    def median_ms(self) -> float:
        return statistics.median(self._times) * 1e3 if self._times else float("nan")

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / statistics.median(self._times) if self._times else 0.0


class MetricsLogger:
    """Structured metrics: one JSON object per record, stdout and/or JSONL.

    Replaces the reference's cout-only telemetry (SURVEY.md §5.5)."""

    def __init__(self, path: str | Path | None = None, *, echo: bool = True):
        self._fh: IO | None = open(path, "a") if path else None
        self._echo = echo

    def log(self, **record):
        line = json.dumps(record)
        if self._echo:
            print(line, flush=True)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None
