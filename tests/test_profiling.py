"""Profiling utility smoke tests."""

import logging

import jax.numpy as jnp

from queasars_tpu.utils.profiling import annotate, trace


def test_trace_wall_clock_logging(caplog):
    with caplog.at_level(logging.INFO, logger="queasars_tpu.utils.profiling"):
        with trace(label="unit-test-region"):
            _ = jnp.arange(8).sum()
    assert any("unit-test-region" in record.getMessage() for record in caplog.records)


def test_trace_capture_writes_profile(tmp_path):
    log_dir = str(tmp_path / "jax-trace")
    with trace(log_dir):
        with annotate("inner"):
            _ = (jnp.arange(128.0) ** 2).sum().block_until_ready()
    import os

    produced = [
        os.path.join(root, name)
        for root, _, names in os.walk(log_dir)
        for name in names
    ]
    assert produced, "profiler trace directory is empty"
