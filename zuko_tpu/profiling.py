r"""Tracing / profiling helpers (new TPU-native aux subsystem — the
reference has none; SURVEY §5).

``trace(dir)`` wraps :func:`jax.profiler.trace` for capturing device
timelines viewable in TensorBoard/Perfetto; ``timeit`` measures steady-state
throughput of a jitted callable with correct device synchronization.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "timeit"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/zuko_tpu_trace"):
    """Capture a device profile: ``with trace('/tmp/t'): step(...)``."""
    with jax.profiler.trace(log_dir):
        yield log_dir


def timeit(fn, *args, iters: int = 10, warmup: int = 1, **kwargs):
    """Return seconds/call of ``fn`` (device-synchronized)."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
