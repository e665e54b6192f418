"""Profiling helpers: JAX traces + throughput timing.

The reference's only instrumentation is tic/toc wall-clock lines in its
run logs (qgsw_raytrace.m:114,178-179). Here:
  * `trace(dir)` — context manager around jax.profiler.trace (view in
    TensorBoard / xprof) for kernel-level TPU timelines;
  * `Timer` — blocking wall-clock timing of jitted callables with
    steps/sec + packet-steps/sec derived rates (what bench.py reports).
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "Timer", "time_callable"]


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    def __init__(self):
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False


def time_callable(fn, *args, warmup: int = 1, iters: int = 3):
    """Time a jitted callable with block_until_ready; returns
    (mean_seconds, last_output)."""
    out = None
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters, out
