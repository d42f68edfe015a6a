"""TPE sampler tests: the reference's optuna TPESampler surface
(reference configs/hparams_search/perceiver_optuna.yaml:32-43)."""

import math

import numpy as np
import pytest

from satflow_tpu.experiments.sweep import TPESampler, sample_params

SPACE = {
    "model.lr": {"type": "loguniform", "low": 1e-5, "high": 1e-1},
    "model.width": {"type": "uniform", "low": -1.0, "high": 1.0},
}


def _objective(params):
    # Deterministic 2-param bowl: optimum at lr=1e-3, width=0.3.
    lr_term = (math.log10(params["model.lr"]) + 3.0) ** 2
    return lr_term + 4.0 * (params["model.width"] - 0.3) ** 2


def _run(sampler_factory, n_trials, seed):
    rng = np.random.default_rng(seed)
    sampler = sampler_factory(seed)
    history = []
    best = math.inf
    for _ in range(n_trials):
        if sampler is None:
            params = sample_params(SPACE, rng)
        else:
            params = sampler.suggest(SPACE, history)
        value = _objective(params)
        history.append((params, value))
        best = min(best, value)
    return best


def test_tpe_beats_random_on_deterministic_objective():
    """VERDICT r1 #7 done-criterion: TPE beats random within N trials."""
    n_trials = 40
    seeds = [0, 1, 2, 3, 4]
    tpe_best = [
        _run(lambda s: TPESampler(seed=s, n_startup_trials=8), n_trials, s)
        for s in seeds
    ]
    rnd_best = [_run(lambda s: None, n_trials, s) for s in seeds]
    # TPE must win on average and on a majority of seeds.
    assert np.mean(tpe_best) < np.mean(rnd_best), (tpe_best, rnd_best)
    wins = sum(t < r for t, r in zip(tpe_best, rnd_best))
    assert wins >= 3, (tpe_best, rnd_best)


def test_tpe_suggests_within_bounds():
    sampler = TPESampler(seed=0, n_startup_trials=2)
    history = []
    space = {
        "a": {"type": "int", "low": 1, "high": 8},
        "b": {"type": "categorical", "choices": [32, 64, 128]},
        "c": {"type": "float", "low": 0.0, "high": 0.5},
    }
    for _ in range(25):
        params = sampler.suggest(space, history)
        assert 1 <= params["a"] <= 8 and isinstance(params["a"], int)
        assert params["b"] in (32, 64, 128)
        assert 0.0 <= params["c"] <= 0.5
        # pretend lower 'c' is better, 'a'=4 optimal
        history.append((params, (params["a"] - 4) ** 2 + params["c"]))


def test_tpe_concentrates_on_good_region():
    """After warmup, TPE samples cluster near the observed optimum."""
    sampler = TPESampler(seed=3, n_startup_trials=10)
    space = {"x": {"type": "uniform", "low": 0.0, "high": 1.0}}
    history = []
    for _ in range(30):
        p = sampler.suggest(space, history)
        history.append((p, (p["x"] - 0.8) ** 2))
    late = [p["x"] for p, _ in history[-10:]]
    assert abs(np.median(late) - 0.8) < 0.25, late


def test_tpe_handles_failed_trials():
    sampler = TPESampler(seed=0, n_startup_trials=2)
    history = [({"x": 0.5}, None), ({"x": 0.2}, 1.0), ({"x": 0.7}, float("nan"))]
    space = {"x": {"type": "uniform", "low": 0.0, "high": 1.0}}
    p = sampler.suggest(space, history)
    assert 0.0 <= p["x"] <= 1.0
