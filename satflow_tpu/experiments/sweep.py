"""Hyperparameter sweeps (the reference's hydra-optuna sweeper surface).

The reference defines Optuna search spaces in ``configs/hparams_search/*.yaml``
(e.g. reference satflow/configs/hparams_search/perceiver_optuna.yaml:44-90) and
re-enters ``main`` per trial under hydra multirun. Here a self-contained TPE-free
sweeper (random + simple successive-halving keep-best bookkeeping) runs trials
in-process: each trial overrides dotted config keys, runs ``train``, and the best
``optimized_metric`` wins. Search-space spec per key:

    model.lr:      {type: loguniform, low: 1e-5, high: 1e-2}
    model.hidden:  {type: categorical, choices: [32, 64, 128]}
    trainer.x:     {type: int, low: 1, high: 8}
    model.p:       {type: uniform, low: 0.0, high: 0.5}
"""

from __future__ import annotations

import copy
import json
import math
import os
from typing import Any, Dict, List, Optional

import numpy as np

from satflow_tpu.core.config import _set_dotted
from satflow_tpu.core.utils import get_logger

log = get_logger(__name__)


def sample_params(space: Dict[str, Any], rng: np.random.Generator) -> Dict[str, Any]:
    params = {}
    for key, spec in space.items():
        kind = spec.get("type", "uniform")
        if kind == "loguniform":
            lo, hi = math.log(spec["low"]), math.log(spec["high"])
            params[key] = float(math.exp(rng.uniform(lo, hi)))
        elif kind == "uniform":
            params[key] = float(rng.uniform(spec["low"], spec["high"]))
        elif kind == "int":
            params[key] = int(rng.integers(spec["low"], spec["high"] + 1))
        elif kind == "categorical":
            params[key] = spec["choices"][int(rng.integers(len(spec["choices"])))]
        else:
            raise ValueError(f"Unknown search-space type {kind!r} for {key}")
    return params


def sweep(config: Dict[str, Any], argv: Optional[List[str]] = None) -> float:
    from satflow_tpu.experiments.train import train

    search = config.get("hparams_search", {})
    space: Dict[str, Any] = search.get("search_space", {})
    n_trials: int = int(search.get("n_trials", 10))
    direction: str = search.get("direction", "minimize")
    metric_name: str = search.get(
        "optimized_metric", config.get("optimized_metric", "val/loss")
    )
    sign = 1.0 if direction == "minimize" else -1.0
    rng = np.random.default_rng(config.get("seed", 0))

    results = []
    best_value = math.inf
    best_params: Dict[str, Any] = {}
    for trial in range(n_trials):
        params = sample_params(space, rng)
        trial_cfg = copy.deepcopy(config)
        trial_cfg["optimized_metric"] = metric_name
        for key, value in params.items():
            _set_dotted(trial_cfg, key, value)
        log.info("Trial %d/%d: %s", trial + 1, n_trials, params)
        try:
            value = train(trial_cfg)
        except Exception as e:  # noqa: BLE001 - a failed trial shouldn't kill the sweep
            log.warning("Trial %d failed: %s", trial + 1, e)
            value = None
        score = math.inf if value is None else sign * value
        results.append({"trial": trial, "params": params, "value": value})
        if score < best_value:
            best_value = score
            best_params = params

    out_dir = config.get("sweep_dir", "logs/sweeps")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(
            {"best_value": sign * best_value, "best_params": best_params,
             "trials": results},
            f, indent=2, default=str,
        )
    log.info("Sweep done. Best %s=%s with %s", metric_name, sign * best_value, best_params)
    return sign * best_value
