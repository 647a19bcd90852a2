"""fenet.utils.profiling: forced-fetch timer, rolling phase timer, traces.

The reference's only instrumentation is wall-clock AverageMeters
(train.py:137-138, 201-203); this covers the TPU-native additions.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from fenet.utils.profiling import StepTimer, synced_seconds, trace


def test_synced_seconds_times_and_forces_fetch():
    calls = []

    @jax.jit
    def f(x):
        return (x * 2).sum()

    def wrapped(x):
        calls.append(1)
        return f(x)

    x = jnp.ones((64, 64))
    t = synced_seconds(wrapped, x, iters=3, warmup=2)
    assert t >= 0.0
    assert len(calls) == 5  # warmup + iters, every call really dispatched


def test_synced_seconds_handles_pytree_and_scalars():
    def f(x):
        return {"a": x + 1, "n": 3}  # non-array leaf must pass through

    t = synced_seconds(f, jnp.zeros((4,)), iters=1, warmup=0)
    assert t >= 0.0


def test_step_timer_phases_and_summary():
    timer = StepTimer()
    time.sleep(0.01)
    dt1 = timer.tick("data")
    time.sleep(0.02)
    dt2 = timer.tick("step")
    assert dt1 >= 0.01 and dt2 >= 0.02
    timer.tick("data")  # second lap accumulates
    s = timer.summary()
    assert set(s) == {"data", "step"}
    assert timer.counts["data"] == 2
    # summary is the per-phase mean
    np.testing.assert_allclose(s["data"], timer.totals["data"] / 2)


def test_trace_writes_profile_artifacts(tmp_path):
    d = str(tmp_path / "trace")
    with trace(d):
        jnp.arange(128).sum().block_until_ready()
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "jax profiler trace produced no files"
