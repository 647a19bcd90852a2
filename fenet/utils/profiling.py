"""Profiling / tracing utilities (SURVEY.md §5).

The reference's instrumentation is wall-clock AverageMeters persisted into
checkpoints (train.py:137-138, 201-203). This module keeps that (the Trainer
uses AverageMeters) and adds the TPU-native layer the reference lacks:
jax profiler traces viewable in TensorBoard/Perfetto, plus a step timer that
forces a device fetch — on this platform ``block_until_ready`` alone can
return before execution finishes, so naive timers lie.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax profiler trace: ``with trace('/tmp/trace'): step()``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def synced_seconds(fn, *args, iters: int = 5, warmup: int = 1) -> float:
    """Wall-clock seconds per call with a forced output fetch each call."""
    import jax

    def force(x):
        return jax.tree_util.tree_map(
            lambda a: np.asarray(a).ravel()[0] if hasattr(a, "ravel") else a, x
        )

    for _ in range(warmup):
        force(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        force(fn(*args))
    return (time.time() - t0) / iters


class StepTimer:
    """Rolling per-phase timings: ``timer.tick('data'); ...; timer.tick('step')``."""

    def __init__(self):
        self._last = time.time()
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    def tick(self, phase: str) -> float:
        now = time.time()
        dt = now - self._last
        self._last = now
        self.totals[phase] = self.totals.get(phase, 0.0) + dt
        self.counts[phase] = self.counts.get(phase, 0) + 1
        return dt

    def summary(self) -> Dict[str, float]:
        return {
            k: self.totals[k] / max(self.counts[k], 1) for k in self.totals
        }
