"""Profiling hooks — replaces the reference's wall-clock prints
(``train/ordinary.py:218,289-291``; SURVEY §5) with jax.profiler traces and a
simple step timer."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in TensorBoard/XProf) around the
    enclosed block. No-op when ``log_dir`` is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA step timer with compile-step exclusion."""

    def __init__(self, alpha: float = 0.1, skip_first: int = 1):
        self.alpha = alpha
        self.skip = skip_first
        self.ema: Optional[float] = None
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count <= self.skip:
            self.last = dt
            return False
        self.ema = dt if self.ema is None else (
            self.alpha * dt + (1 - self.alpha) * self.ema)
        self.last = dt
        return False
