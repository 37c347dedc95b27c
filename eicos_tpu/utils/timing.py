"""Timing utilities — the analogue of the reference's tic/toc helpers
(/root/reference/include/timing.hpp:5-15), plus TPU-aware helpers that
block on device work (wall-clock around async dispatch is meaningless) and
a jax.profiler trace context for deep profiling.
"""

from __future__ import annotations

import contextlib
import time


def tic() -> float:
    """Start a timer (returns an opaque token for toc)."""
    return time.perf_counter()


def toc(t0: float) -> float:
    """Milliseconds since ``tic()`` — matches the reference's ms units."""
    return 1e3 * (time.perf_counter() - t0)


def timed(fn, *args, **kwargs):
    """Run ``fn`` blocking on all returned device arrays; returns
    (result, milliseconds)."""
    import jax

    t0 = tic()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, toc(t0)


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """jax.profiler trace context: device-level timeline for TensorBoard.
    The reference's only profiling is the verbose stats table
    (/root/reference/src/eicos.cpp:733-753); on TPU the profiler trace is
    the real tool."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
