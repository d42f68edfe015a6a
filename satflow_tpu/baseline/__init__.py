"""Baseline parity harness (reference satflow/baseline)."""

from satflow_tpu.baseline.optical_flow import run_baseline  # noqa: F401
