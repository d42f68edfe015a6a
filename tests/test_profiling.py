"""Profiling subsystem tests: trace capture + parse fallback."""

import glob
import os

import jax.numpy as jnp

from satflow_tpu.train.profiling import capture_trace, op_breakdown, profile_fn


def test_capture_trace_writes_xplane(tmp_path):
    d = capture_trace(lambda: jnp.sum(jnp.ones((64, 64)) * 2), str(tmp_path))
    files = glob.glob(os.path.join(d, "**", "*"), recursive=True)
    assert files, "trace dir is empty"


def test_profile_fn_returns_rows_or_empty(tmp_path):
    trace_dir, rows = profile_fn(
        lambda: jnp.dot(jnp.ones((128, 128)), jnp.ones((128, 128))),
        out_dir=str(tmp_path),
    )
    assert os.path.isdir(trace_dir)
    assert isinstance(rows, list)  # [] when the plugin can't parse CPU traces


def test_op_breakdown_missing_dir():
    assert op_breakdown("/nonexistent/dir") == []
