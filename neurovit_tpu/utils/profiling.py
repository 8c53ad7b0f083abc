"""Profiling/tracing: jax.profiler hooks + per-step timing.

The reference has no profiling beyond wall-clock windows (SURVEY §5.1).
Here: a `StepTimer` for per-step latency stats (deferred device syncs) and a
`trace` context that records an XLA/TPU profile viewable in TensorBoard /
Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "./results/profile"):
    """Capture a device trace: `with trace(): run_steps()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step stats. Call mark() after each dispatched step;
    summary() blocks on the last result and reports mean/p50/p95."""

    def __init__(self):
        self._times: List[float] = []
        self._last = None

    def mark(self, result=None) -> None:
        self._times.append(time.perf_counter())
        self._last = result

    def summary(self) -> Optional[Dict[str, float]]:
        if self._last is not None:
            jax.block_until_ready(self._last)
            self._times.append(time.perf_counter())
            self._last = None
        if len(self._times) < 2:
            return None
        deltas = np.diff(self._times)
        return {
            "steps": int(len(deltas)),
            "mean_s": float(deltas.mean()),
            "p50_s": float(np.percentile(deltas, 50)),
            "p95_s": float(np.percentile(deltas, 95)),
            "steps_per_sec": float(1.0 / max(deltas.mean(), 1e-12)),
        }

    def reset(self) -> None:
        self._times.clear()
        self._last = None
