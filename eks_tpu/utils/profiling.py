"""Profiling and observability helpers.

The reference's observability is DEBUG-level ``[timing]`` wall-clock stage
timers (eks/core.py:228-301, eks/multicam_smoother.py:245-549); those exist
inline here too. This module adds the TPU-side instruments on top:
``jax.profiler`` trace capture and per-program XLA cost analysis.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Any, Callable

import jax

logger = logging.getLogger(__name__)

__all__ = [
    "stage_timer",
    "device_trace",
    "cost_summary",
    "record_opt_stats",
    "LAST_OPT_STATS",
]

# Optimizer convergence recording (off by default: reading the iteration
# counters costs one device->host pull per optimize call, ~30-50ms over a
# remote-attached chip). The benchmark enables it on its warm-up runs to get
# honest iteration counts for the CPU-baseline extrapolation.
RECORD_OPT_STATS = False
LAST_OPT_STATS: dict = {}


@contextlib.contextmanager
def record_opt_stats():
    """Record optimizer convergence stats (joint/loop iteration counts) from
    smoother runs inside the block into ``LAST_OPT_STATS``."""
    global RECORD_OPT_STATS
    prev = RECORD_OPT_STATS
    RECORD_OPT_STATS = True
    LAST_OPT_STATS.clear()
    try:
        yield LAST_OPT_STATS
    finally:
        RECORD_OPT_STATS = prev


@contextlib.contextmanager
def stage_timer(name: str, logger_: logging.Logger | None = None):
    """Log ``[timing] {name}: {seconds}s`` at DEBUG on exit."""
    log = logger_ or logger
    t0 = time.perf_counter()
    try:
        yield
    finally:
        log.debug(f"[timing] {name}: {time.perf_counter() - t0:.3f}s")


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a ``jax.profiler`` trace (viewable in TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_summary(fn: Callable, *args: Any, **kwargs: Any) -> dict:
    """Compile ``fn`` for the given arguments and return XLA's cost analysis
    (flops, bytes accessed, ...). Returns {} when the backend provides none."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    analysis = compiled.cost_analysis()
    if analysis is None:
        return {}
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0] if analysis else {}
    return dict(analysis)
