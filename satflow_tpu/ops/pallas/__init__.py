"""Pallas TPU kernels (flag-gated, with XLA fallbacks)."""

from satflow_tpu.ops.pallas.fused_lstm import (  # noqa: F401
    fused_lstm_gates,
    pallas_available,
)
