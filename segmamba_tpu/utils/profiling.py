"""Profiling hooks.

The reference has only ad-hoc wall-clock prints
(/root/reference/light_training/trainer.py:433-474,
base_data_loader.py:58-62); here profiling is structured: a step timer with
rolling statistics and a ``jax.profiler`` trace context for device-level
analysis (a greenfield capability per SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


class StepTimer:
    """Rolling wall-clock stats for loop phases (data/compute/total)."""

    def __init__(self, window=100):
        self.window = window
        self._marks = {}
        self._series = {}

    def mark(self, name):
        self._marks[name] = time.perf_counter()

    def elapsed(self, name, since):
        dt = time.perf_counter() - self._marks[since]
        self._series.setdefault(name, []).append(dt)
        if len(self._series[name]) > self.window:
            self._series[name].pop(0)
        return dt

    def stats(self):
        return {k: {"mean": float(np.mean(v)), "p50": float(np.median(v)),
                    "max": float(np.max(v))}
                for k, v in self._series.items() if v}


@contextlib.contextmanager
def trace_context(logdir, enabled=True):
    """jax.profiler trace (view in TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
