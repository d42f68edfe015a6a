"""Core utilities: config surgery, pretty-printing, logging, seeding.

Reimplements the behavior of reference satflow/core/utils.py on the TPU stack:
- ``extras`` derives cross-config values (``datamodule.forecast_minutes`` from
  ``model.forecast_steps``×5, ``model.input_channels`` from the dataset
  configuration's enabled sources) — reference satflow/core/utils.py:44-129.
- ``print_config`` renders a Rich tree of the composed config —
  reference satflow/core/utils.py:133-169.
- ``get_logger`` returns a process-zero-aware logger —
  reference satflow/core/utils.py:30-41.
- ``log_hyperparameters`` computes parameter counts for the loggers —
  reference satflow/core/utils.py:177-212.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np

# Batch-schema constants live in data.consts (single source of truth);
# re-exported here because the reference defines the cadence in core/utils
# (satflow/core/utils.py:63) and existing callers import from here.
from satflow_tpu.data.consts import (  # noqa: E402
    DATETIME_FEATURE_NAMES,
    MINUTES_PER_STEP,
)


# Rank for the rank-zero logging gate. Set by
# parallel.distributed.maybe_initialize_distributed() AFTER jax.distributed
# comes up; before that every host passes. The gate must NOT call
# jax.process_index() eagerly: get_logger runs at module import (run.py,
# experiments/train.py), and touching the backend there initializes jax
# BEFORE jax.distributed.initialize() can run — which raises, gets swallowed
# by the single-host fallback, and silently turns a pod run into N
# disconnected single-host runs.
_PROCESS_INDEX: int = 0


class _RankZeroFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # noqa: A003
        return _PROCESS_INDEX == 0


def set_logging_process_index(index: int) -> None:
    """Record this host's process index for the rank-zero logging gate."""
    global _PROCESS_INDEX
    _PROCESS_INDEX = int(index)


def get_logger(name: str = __name__, level: int = logging.INFO) -> logging.Logger:
    """Multi-host-aware logger: only process 0 emits (reference :30-41 rank_zero).

    The rank check is LAZY (per record, against ``_PROCESS_INDEX``) — see the
    comment above; it must never touch the jax backend at import time."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not any(isinstance(f, _RankZeroFilter) for f in logger.filters):
        logger.addFilter(_RankZeroFilter())
    return logger


log = get_logger(__name__)


def derived_input_channels(dataset_cfg: Dict[str, Any]) -> int:
    """Channel count the model sees after the datamodule stacks all sources.

    Mirrors reference satflow/core/utils.py:67-90 (via check_channels at
    satflow/data/utils/utils.py:163): sat channels + NWP channels + topo +
    coordinate channels + datetime features.
    """
    inp = dataset_cfg.get("input_data", dataset_cfg)
    channels = 0
    sat = inp.get("sat_channels") or inp.get("satellite", {}).get("sat_channels")
    if sat:
        channels += len(sat) if isinstance(sat, (list, tuple)) else int(sat)
    nwp = inp.get("nwp_channels") or inp.get("nwp", {}).get("nwp_channels")
    if nwp:
        channels += len(nwp) if isinstance(nwp, (list, tuple)) else int(nwp)
    if inp.get("add_topographic_data", inp.get("topographic", False)):
        channels += 1
    if inp.get("add_coordinates", False):
        channels += 2
    if inp.get("add_datetime_features", False):
        channels += len(DATETIME_FEATURE_NAMES)
    return channels


def extras(config: Dict[str, Any]) -> Dict[str, Any]:
    """Cross-config consistency surgery (reference satflow/core/utils.py:44-129).

    - Propagate ``model.forecast_steps`` into ``datamodule.forecast_minutes`` and
      ``model.history_steps`` into ``datamodule.history_minutes`` (5-min cadence).
    - Derive ``model.input_channels`` from the dataset configuration when present.
    - ``debug: true`` forces fast_dev_run-style limits onto the trainer node.
    """
    config = dict(config)
    model = config.get("model", {})
    dm = dict(config.get("datamodule", {}))

    if "forecast_steps" in model:
        dm.setdefault("forecast_minutes", int(model["forecast_steps"]) * MINUTES_PER_STEP)
    if "history_steps" in model:
        dm.setdefault("history_minutes", int(model["history_steps"]) * MINUTES_PER_STEP)
    config["datamodule"] = dm

    dataset_cfg = config.get("configuration") or dm.get("configuration")
    if dataset_cfg and isinstance(model, dict) and "input_channels" not in model:
        try:
            model = dict(model)
            model["input_channels"] = derived_input_channels(dataset_cfg)
            config["model"] = model
        except Exception:  # noqa: BLE001 - derivation is best-effort, as in reference
            log.warning("Could not derive model.input_channels from dataset config")

    if config.get("debug"):
        trainer = dict(config.get("trainer", {}))
        trainer["fast_dev_run"] = True
        config["trainer"] = trainer
        # single-threaded data path for breakpoint-friendly debugging: the
        # knob belongs to the DATAMODULE (the Trainer has no num_workers)
        datamodule = dict(config.get("datamodule", {}))
        datamodule["num_workers"] = 0
        config["datamodule"] = datamodule
    return config


def print_config(
    config: Dict[str, Any],
    fields: Sequence[str] = ("trainer", "model", "datamodule", "callbacks", "logger", "seed"),
    resolve: bool = True,
) -> None:
    """Rich-tree config printout (reference satflow/core/utils.py:133-169)."""
    try:
        import rich.syntax
        import rich.tree
        import yaml

        tree = rich.tree.Tree(":gear: CONFIG")
        for field in fields:
            if field not in config:
                continue
            branch = tree.add(field)
            branch.add(
                rich.syntax.Syntax(
                    yaml.dump(config[field], default_flow_style=False), "yaml"
                )
            )
        rich.print(tree)
    except Exception:  # noqa: BLE001 - printing must never break a run
        import pprint

        pprint.pprint({k: config.get(k) for k in fields if k in config})


def count_parameters(params) -> Dict[str, int]:
    """Total/trainable parameter counts (reference satflow/core/utils.py:196-206)."""
    leaves = jax.tree_util.tree_leaves(params)
    total = int(sum(np.prod(np.asarray(x.shape, dtype=np.int64)) for x in leaves))
    return {"params/total": total, "params/trainable": total}


def log_hyperparameters(config: Dict[str, Any], params, loggers) -> None:
    """Send chosen hparams + parameter counts to every logger."""
    hparams: Dict[str, Any] = {}
    for key in ("trainer", "model", "datamodule", "seed"):
        if key in config:
            hparams[key] = config[key]
    hparams.update(count_parameters(params))
    for lg in loggers or []:
        if hasattr(lg, "log_hyperparams"):
            lg.log_hyperparams(hparams)


def setup_compilation_cache(path: Optional[str] = None) -> None:
    """Enable jax's persistent compilation cache (huge win on slow hosts).

    Default dir: $SATFLOW_JAX_CACHE or ~/.cache/satflow_tpu_jax. Safe to call
    multiple times; silently no-ops if the backend already initialized with a
    cache configured.
    """
    import os

    path = path or os.environ.get(
        "SATFLOW_JAX_CACHE", os.path.expanduser("~/.cache/satflow_tpu_jax")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001
        pass


def seed_everything(seed: Optional[int]) -> jax.Array:
    """Seed numpy + return the root JAX PRNGKey (reference train.py:34)."""
    if seed is None:
        seed = 0
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
