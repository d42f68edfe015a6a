"""Evaluation harness: per-lead-time metric curves for trained checkpoints."""

from satflow_tpu.eval.evaluate import evaluate_model  # noqa: F401
from satflow_tpu.eval.probabilistic import (  # noqa: F401
    crps_deterministic,
    crps_ensemble,
    evaluate_ensemble,
)
