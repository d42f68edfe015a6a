"""Core: config composition, registries, logging/config utilities."""

from satflow_tpu.core.registry import (  # noqa: F401
    create_model,
    get_model,
    list_models,
    register_model,
)
