"""Tracing/profiling — the reference's ad-hoc timing, plus real TPU traces.

Reference (SURVEY.md §5): ``print_time`` decorator on every prune entry point
(compression/pruners/utils.py:6-18) and wall-clock + peak-memory YAML dumps
(evaluate_blip.py:458-472; see runners/runner.py save_training_statistics).
TPU-native addition: ``trace`` wraps a block in a jax.profiler trace that
XProf/TensorBoard can read — the reference has no profiler integration.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Optional


def print_time(func):
    """Log a function's wall-clock (compression/pruners/utils.py:6-18)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        start = time.time()
        out = func(*args, **kwargs)
        print(f"{func.__name__} spent {time.time() - start:.3f} s")
        return out

    return wrapper


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None, name: str = "ecoflap"):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating named timers for phase breakdowns."""

    def __init__(self):
        self.totals = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.time() - t0

    def summary(self) -> str:
        return "  ".join(f"{k}: {v:.2f}s" for k, v in self.totals.items())
