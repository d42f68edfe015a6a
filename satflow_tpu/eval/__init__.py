"""Evaluation harness: per-lead-time metric curves for trained checkpoints."""

from satflow_tpu.eval.evaluate import evaluate_model  # noqa: F401
