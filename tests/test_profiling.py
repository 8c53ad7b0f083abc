"""Step timer stats + profiler trace capture."""

import pytest
import glob
import os
import time

import jax.numpy as jnp

from neurovit_tpu.utils.profiling import StepTimer, trace


def test_step_timer_stats():
    t = StepTimer()
    assert t.summary() is None
    for _ in range(5):
        t.mark(jnp.ones(4))
        time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 5
    assert s["mean_s"] >= 0.01
    assert s["steps_per_sec"] > 0
    t.reset()
    assert t.summary() is None


@pytest.mark.slow
def test_trace_writes_profile(tmp_path):
    out = str(tmp_path / "prof")
    with trace(out):
        (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    files = glob.glob(os.path.join(out, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files)
