"""Profiling / tracing (SURVEY.md §5: the reference has none — only
wall-clock prints; this is a new capability, not a port).

Wraps jax.profiler: on-demand trace capture around train steps, plus a
lightweight step timer that mirrors the reference's time-based console
cadence. Traces are viewable in TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace for the enclosed block."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling per-step timing with compile-step exclusion."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self.count = 0
        self.total = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.skip_first:
            self.total += dt

    @property
    def mean_s(self) -> float:
        n = max(1, self.count - self.skip_first)
        return self.total / n


def maybe_trace_steps(enabled: bool, log_dir: str, start_step: int,
                      num_steps: int):
    """Returns a callable step-hook: call hook(step) every iteration; it
    starts/stops a trace covering [start_step, start_step+num_steps)."""
    state = {"on": False}

    def hook(step: int):
        if not enabled:
            return
        if step == start_step and not state["on"]:
            os.makedirs(log_dir, exist_ok=True)
            jax.profiler.start_trace(log_dir)
            state["on"] = True
        elif step == start_step + num_steps and state["on"]:
            jax.profiler.stop_trace()
            state["on"] = False

    return hook
