"""Tracing / profiling utilities (SURVEY §5).

The reference's only performance tooling is a print-only PettingZoo
benchmark (tests/test_gobblet_env.py:62-65).  Here:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-viewable trace directory;
* :class:`Throughput` — steps/s counter with device-sync boundaries;
* :func:`annotate` — named TraceAnnotation for profiler timelines.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device profile: ``with profiling.trace("/tmp/prof"): ...``"""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region in the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """steps/s meter: ``t = Throughput(); ...; r = t.rate(n_steps, result)``.

    ``rate`` blocks on ``result`` (any jax pytree) so the measurement covers
    real device execution, then returns steps/sec and resets the clock.
    """

    def __init__(self):
        self._t0 = time.perf_counter()

    def reset(self):
        self._t0 = time.perf_counter()

    def rate(self, num_steps: int, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self._t0 = time.perf_counter()
        return num_steps / dt if dt > 0 else float("inf")
