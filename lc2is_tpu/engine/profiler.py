"""Tracing/profiling utilities (SURVEY.md §5.1 — the reference has only an
unused wall-clock ``timeit`` decorator, ``metrics.py:14-23``).

TPU-native equivalents:
- ``timeit``: same decorator surface, with ``block_until_ready`` on jax
  outputs so device work is actually measured;
- ``trace``: context manager around ``jax.profiler`` (view in TensorBoard /
  xprof);
- ``StepTimer``: per-step wall-clock with warmup discard, used by bench and
  the engine's steps/s report.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Optional

import jax


def timeit(func):
    """``metrics.py:14-23`` with honest device timing."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        start = time.perf_counter()
        result = func(*args, **kwargs)
        result = jax.block_until_ready(result)
        total = time.perf_counter() - start
        print(f"Function {func.__name__} took {total:.4f} seconds")
        return result

    return wrapper


@contextlib.contextmanager
def trace(logdir: str = "/tmp/lc2is_trace"):
    """jax.profiler trace for TensorBoard (SURVEY.md §5.1 TPU equivalent)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._n = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / self.mean if self.times else 0.0
