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
import jax.numpy as jnp

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


@jax.jit
def _first_scalar(x):
    return jnp.real(jnp.ravel(x)[0]).astype(jnp.float32)


def _sync(out):
    """Force completion of `out`. On the axon TPU backend
    jax.block_until_ready returns before execution finishes (measured:
    a 455 ms gather 'completes' in 0.2 ms under it) — only a host fetch
    truly synchronizes, so fetch one scalar from the first leaf (via a
    jitted real-cast: complex buffers cannot cross the boundary there)."""
    jax.block_until_ready(out)
    leaves = jax.tree_util.tree_leaves(out)
    if leaves and isinstance(leaves[0], jax.Array):
        float(_first_scalar(leaves[0]))
    return out


def time_callable(fn, *args, warmup: int = 1, iters: int = 3):
    """Time a jitted callable with real synchronization (see _sync);
    returns (mean_seconds, last_output)."""
    out = None
    for _ in range(warmup):
        out = _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = _sync(fn(*args))
    return (time.perf_counter() - t0) / iters, out
