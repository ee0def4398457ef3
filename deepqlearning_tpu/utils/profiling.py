"""Profiling and debug hooks.

Reference has none built in (SURVEY.md §5.1 — dev-time ``@btime`` only);
here we expose ``jax.profiler`` traces and a NaN-check switch as first-class
utilities.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enabled: bool = True):
    """Debug-NaN mode (SURVEY.md §5.2): every jitted output is checked."""
    jax.config.update("jax_debug_nans", enabled)


class StepTimer:
    """Cheap wall-clock EMA of host-loop segment times for the logger."""

    def __init__(self, alpha: float = 0.2):
        self.alpha = alpha
        self.ema = None
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.ema = dt if self.ema is None else (
                self.alpha * dt + (1 - self.alpha) * self.ema
            )
        self._last = now
        return self.ema
