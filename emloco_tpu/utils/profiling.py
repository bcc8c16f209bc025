"""Profiling hooks: jax.profiler traces + phase timing.

The reference only has wall-clock segment timers (play/update/total,
amp_continuous.py:224-306). Here the env step is one compiled function, so a
device trace is legible per phase; `trace()` wraps jax.profiler for perfetto
dumps, `device_timer` gives blocking wall-times of jitted fns.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/emloco_trace"):
    """Capture a device trace viewable in perfetto/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_timer(fn, *args, iters: int = 5, warmup: int = 1):
    """Blocking average wall time of a jitted callable, seconds."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def annotate(name: str):
    """Named region for traces (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
