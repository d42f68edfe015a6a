"""Probabilistic forecast metrics: ensemble CRPS and spread.

CRPS is the headline probabilistic metric of the skillful-nowcasting paper
behind the reference's DGMR lineage (the NowcastingGAN config,
reference satflow/configs/model/nowcasting_gan.yaml:1-15, samples
``num_samples`` Monte-Carlo draws per forecast — exactly the ensemble a
CRPS evaluates). The deterministic eval stack (eval/evaluate.py) scores the
ensemble MEAN only, which cannot distinguish a calibrated sampler from one
collapsed to the conditional mean; CRPS can, and is therefore the selection
metric for the DGMR quality gate (tools/gan_gate.py).

For an M-member ensemble x_1..x_M and observation y (per scalar):

    CRPS = (1/M) * sum_i |x_i - y|  -  coef * sum_{i,j} |x_i - x_j|

with ``coef = 1/(2 M^2)`` (the classic estimator — exact when the members
ARE the atoms of the forecast distribution) or ``1/(2 M (M-1))`` when
``fair=True`` (unbiased for iid draws FROM the forecast distribution).
A deterministic forecast is the M=1 ensemble, for which CRPS reduces to MAE
— so deterministic baselines (persistence, optical flow) are directly
comparable on the same scale.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def crps_ensemble(samples: jax.Array, y: jax.Array, fair: bool = False) -> jax.Array:
    """Per-lead-time CRPS curve.

    Args:
      samples: ``(B, M, T, ...)`` ensemble forecasts (M members).
      y: ``(B, T, ...)`` observations.
      fair: use the unbiased ``1/(2 M (M-1))`` spread coefficient (requires
        M >= 2); default is the classic ``1/(2 M^2)`` estimator.

    Returns:
      ``(T,)`` CRPS averaged over batch/space/channels per lead time.
    """
    m = samples.shape[1]
    term1 = jnp.mean(jnp.abs(samples - y[:, None]), axis=1)  # (B, T, ...)
    if m == 1:
        crps = term1  # MAE: no spread term for a deterministic forecast
    else:
        diffs = jnp.abs(samples[:, :, None] - samples[:, None, :])
        denom = 2 * m * (m - 1) if fair else 2 * m * m
        crps = term1 - jnp.sum(diffs, axis=(1, 2)) / denom  # (B, T, ...)
    reduce_axes = tuple(i for i in range(crps.ndim) if i != 1)
    return jnp.mean(crps, axis=reduce_axes)


def evaluate_ensemble(
    model,
    variables,
    dataset: Iterable,
    num_samples: Optional[int] = None,
    max_batches: Optional[int] = None,
    rng_seed: int = 42,
    fair: bool = False,
) -> Dict[str, np.ndarray]:
    """CRPS / ensemble-mean-MSE / spread curves for a sampling model.

    Works with any model exposing ``_sample(variables, x, rng, train, n)``
    returning ``((B, n, T, H, W, C) samples, state)`` — the DGMR family.

    Returns dict with ``crps`` (T,), ``mse`` (T,) of the ensemble mean,
    ``sample_std`` (scalar spread), and scalar means.
    """
    n = num_samples or getattr(model, "num_samples", 3)

    @jax.jit
    def batch_metrics(variables, x, y, rng):
        samples, _ = model._sample(variables, x, rng, False, n)
        crps_t = crps_ensemble(samples, y, fair=fair)
        mean_pred = jnp.mean(samples, axis=1)
        se = jnp.square(mean_pred - y)
        mse_t = jnp.mean(se, axis=tuple(i for i in range(se.ndim) if i != 1))
        std = jnp.mean(jnp.std(samples, axis=1))
        return {"crps": crps_t, "mse": mse_t, "sample_std": std}

    sums: Dict[str, np.ndarray] = {}
    count = 0
    for bi, batch in enumerate(dataset):
        if max_batches is not None and bi >= max_batches:
            break
        x, y = model.prepare_batch(batch)
        metrics = jax.device_get(
            batch_metrics(variables, jnp.asarray(x), jnp.asarray(y),
                          jax.random.PRNGKey(rng_seed + bi))
        )
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + np.asarray(v)
        count += 1

    if not count:
        raise ValueError("evaluate_ensemble got an empty dataset (or "
                         "max_batches=0) — nothing to score")
    results = {k: v / count for k, v in sums.items()}
    results["crps_mean"] = float(np.mean(results["crps"]))
    results["mse_mean"] = float(np.mean(results["mse"]))
    results["sample_std"] = float(results["sample_std"])
    return results


def crps_deterministic(y_hat: jax.Array, y: jax.Array) -> jax.Array:
    """Per-lead-time CRPS of a deterministic forecast (= MAE).

    ``y_hat``/``y``: ``(B, T, ...)``. The M=1 degenerate case of
    :func:`crps_ensemble`, provided so baselines score on the same scale.
    """
    return crps_ensemble(y_hat[:, None], y)
