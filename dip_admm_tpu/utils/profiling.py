"""Profiling and timing hooks.

The reference's only observability is print-tagged solver logging
(``/root/reference/block_6_admm_loop_ver2.py:118-132``, SURVEY §5). Here:
``trace`` wraps a region in a ``jax.profiler`` trace (inspect with
TensorBoard / xprof), and ``time_fn`` measures steady-state latency of a
jitted callable with proper warmup and ``block_until_ready``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> dict:
    """Steady-state timing of ``fn(*args)`` (jit-compatible callables)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "best_s": times[0],
        "median_s": times[len(times) // 2],
        "mean_s": sum(times) / len(times),
        "iters": iters,
    }
