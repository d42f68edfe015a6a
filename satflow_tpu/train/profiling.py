"""Profiling: jax trace capture + op-level breakdown (SURVEY §5.1, exceeded).

The reference delegates profiling to PL's simple/pytorch profilers (reference
configs/trainer/simple_profiler.yaml:33, pytorch_profiler.yaml:33). Here:

- ``Trainer(profiler="jax")`` wraps the fit loop in ``jax.profiler.trace``
  (engine.py), producing an xplane dump for TensorBoard.
- ``profile_fn`` captures a trace of one callable and — when
  ``tensorboard_plugin_profile`` is importable — parses the xplane into a
  framework-op time table, returning the top-k ops by self time. This answers
  "where does the step time go" without a TensorBoard UI.
"""

from __future__ import annotations

import glob
import json
import os
import tempfile
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax


def capture_trace(fn: Callable[[], Any], out_dir: Optional[str] = None) -> str:
    """Run ``fn`` under jax.profiler.trace; returns the trace directory."""
    out_dir = out_dir or tempfile.mkdtemp(prefix="satflow_prof_")
    with jax.profiler.trace(out_dir):
        result = fn()
        jax.block_until_ready(result)
    return out_dir


def op_breakdown(trace_dir: str, top_k: int = 20) -> List[Dict[str, Any]]:
    """Parse an xplane trace into the top-k ops by self time.

    Requires tensorboard_plugin_profile; returns [] with a note otherwise.
    """
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        return []
    # the plugin ships pre-protobuf-4 generated code; needs the pure-python
    # protobuf impl, which must be selected before protobuf first loads —
    # set PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python at process start to
    # get parsed tables here.
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

        data, _ = raw_to_tool_data.xspace_to_tool_data(
            paths, "framework_op_stats^", {}
        )
    except Exception:  # noqa: BLE001 - plugin/protobuf version mismatches
        return []
    if isinstance(data, bytes):
        data = data.decode()
    try:
        stats = json.loads(data)
    except json.JSONDecodeError:
        return []
    rows = _extract_rows(stats)
    rows.sort(key=lambda r: -r.get("self_time_us", 0.0))
    return rows[:top_k]


def _extract_rows(stats) -> List[Dict[str, Any]]:
    """Best-effort extraction across plugin-version table layouts."""
    rows: List[Dict[str, Any]] = []
    tables = stats if isinstance(stats, list) else [stats]
    for table in tables:
        if not isinstance(table, dict):
            continue
        cols = [c.get("label", c.get("id", "")) for c in table.get("cols", [])]
        for row in table.get("rows", []):
            vals = [c.get("v") for c in row.get("c", [])]
            entry = dict(zip(cols, vals))
            name = entry.get("Operation") or entry.get("op_name") or entry.get("Type")
            t = (entry.get("Total self-time (us)") or entry.get("self_time_us")
                 or entry.get("Avg. self-time (us)") or 0.0)
            if name:
                rows.append({"op": str(name), "self_time_us": float(t or 0.0),
                             **{k: v for k, v in entry.items() if k not in ("Operation",)}})
    return rows


def profile_fn(
    fn: Callable[[], Any], top_k: int = 20, out_dir: Optional[str] = None
) -> Tuple[str, List[Dict[str, Any]]]:
    """Capture + parse in one call; returns (trace_dir, top-k op rows)."""
    trace_dir = capture_trace(fn, out_dir)
    return trace_dir, op_breakdown(trace_dir, top_k)
