"""Profiling helpers: stage timers, trace capture, cost analysis."""

import logging
import os

import jax.numpy as jnp

from eks_tpu.utils.profiling import cost_summary, device_trace, stage_timer


def test_stage_timer_logs(caplog):
    logger = logging.getLogger("eks_tpu.test")
    with caplog.at_level(logging.DEBUG, logger="eks_tpu.test"):
        with stage_timer("unit-test-stage", logger_=logger):
            pass
    assert any("[timing] unit-test-stage" in r.message for r in caplog.records)


def test_cost_summary():
    def f(x):
        return (x @ x.T).sum()

    stats = cost_summary(f, jnp.ones((64, 64)))
    assert isinstance(stats, dict)
    # CPU backend reports flops for a matmul
    if "flops" in stats:
        assert stats["flops"] > 0


def test_device_trace_writes(tmp_path):
    with device_trace(str(tmp_path)):
        jnp.ones(8).sum().block_until_ready()
    # the profiler lays down a plugins/profile directory
    found = []
    for root, dirs, files in os.walk(tmp_path):
        found.extend(files)
    assert len(found) > 0
