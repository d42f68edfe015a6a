"""Experiment drivers."""

from satflow_tpu.experiments.train import train  # noqa: F401
