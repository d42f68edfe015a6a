"""CRPS fine-tuning for the probabilistic (sampling) model family.

The DGMR lineage trains adversarially with a grid-cell regularizer on the
sample MEAN (reference satflow/configs/model/nowcasting_gan.yaml:1-15 via
skillful_nowcasting). On small/synthetic data that objective mode-collapses:
the trained sampler's Monte-Carlo draws converge to the conditional mean
(measured in docs/ACCURACY.md, GAN section). This module adds the standard
probabilistic-forecasting remedy on top: a short generator-only fine-tune on
the **fair ensemble CRPS** (`eval/probabilistic.crps_ensemble(fair=True)`).

Fair CRPS is a strictly proper scoring rule for iid ensemble draws: its
expectation is minimized exactly when the sampler's distribution equals the
true predictive distribution — so, unlike the adversarial+regularizer
objective, it rewards accuracy AND calibrated spread in one differentiable
scalar. Gradients flow pathwise through the generator's reparameterized
latent draws (the noise enters via ``rngs``; the network transform is
differentiable), so plain Adam on the generator parameters works.

Used by tools/gan_gate.py to close the measured accuracy-vs-diversity gap of
the CRPS-selected DGMR checkpoint; gated by tests/test_dgmr.py.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from satflow_tpu.eval.probabilistic import crps_ensemble


def crps_finetune(
    model,
    g_vars: Dict[str, Any],
    batches: Iterable,
    *,
    steps: int = 300,
    num_samples: int = 6,
    lr: float = 5e-5,
    lr_schedule: str = "constant",
    seed: int = 0,
    log_every: int = 50,
    eval_every: Optional[int] = None,
    eval_fn: Optional[Any] = None,
) -> Tuple[Dict[str, Any], List[float]]:
    """Fine-tune a sampling model's generator on fair ensemble CRPS.

    Args:
      model: a model exposing ``prepare_batch(batch) -> (x, y)`` and
        ``_sample(g_vars, x, rng, train, n) -> (samples (B,n,T,...), state)``
        (the GAN-base sampling contract, e.g. ``NowcastingGAN``).
      g_vars: generator variables ``{"params": ..., **state}``. Non-param
        collections (spectral-norm u/v, batch stats) are FROZEN during the
        fine-tune — the point is a short, stable distribution correction of
        an already-trained generator, not continued adversarial training.
      batches: an iterable of batches, cycled for ``steps`` updates.
      num_samples: ensemble size per update. Fair CRPS needs >= 2; more
        members lower the gradient variance of the spread term (the
        ``1/(2M(M-1))`` estimator is unbiased at any M >= 2).
      log_every: period of entries recorded in the returned loss history
        (step 0 and the final step are always recorded).
      lr_schedule: ``"constant"`` or ``"cosine"`` (decay ``lr`` to ~0 over
        ``steps`` after a 5% linear warmup — the long-schedule recipe; the
        flat-lr fair-CRPS loss plateaus noisily, see docs/ACCURACY.md).
      eval_every / eval_fn: if both given, ``eval_fn({"params": p, **frozen})``
        runs every ``eval_every`` steps (and at the end); its results are
        returned as the ``frontier`` attribute on the history list — the
        CRPS-vs-spread-vs-MSE frontier of the fine-tune.

    Returns:
      (new_g_vars, history) — fine-tuned variables (same structure as
      ``g_vars``) and the recorded fair-CRPS values. When eval_fn is given,
      ``history.frontier`` holds [(step, eval_result), ...].
    """
    if num_samples < 2:
        raise ValueError("fair CRPS needs num_samples >= 2 "
                         f"(got {num_samples})")
    params = g_vars["params"]
    frozen = {k: v for k, v in g_vars.items() if k != "params"}
    if lr_schedule == "cosine":
        warmup = max(1, steps // 20)
        sched = optax.warmup_cosine_decay_schedule(
            init_value=lr / 10, peak_value=lr, warmup_steps=warmup,
            decay_steps=steps, end_value=lr / 100,
        )
        opt = optax.adam(sched)
    else:
        opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, x, y, rng):
        samples, _ = model._sample(
            {"params": p, **frozen}, x, rng, False, num_samples
        )
        return jnp.mean(crps_ensemble(samples, y, fair=True))

    @jax.jit
    def step_fn(p, o, x, y, rng):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y, rng)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    cache = [model.prepare_batch(b) for b in batches]
    if not cache:
        raise ValueError("crps_finetune needs at least one batch")
    rng = jax.random.PRNGKey(seed)

    class _History(list):
        frontier: List[Tuple[int, Any]]

    history = _History()
    history.frontier = []
    loss: Optional[jax.Array] = None
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        x, y = cache[i % len(cache)]
        params, opt_state, loss = step_fn(params, opt_state, x, y, sub)
        if i % log_every == 0:
            history.append(float(loss))
        if eval_fn is not None and eval_every and (i + 1) % eval_every == 0:
            history.frontier.append(
                (i + 1, eval_fn({"params": params, **frozen}))
            )
    if loss is not None:
        history.append(float(loss))
    if eval_fn is not None and (
        not history.frontier or history.frontier[-1][0] != steps
    ):
        history.frontier.append((steps, eval_fn({"params": params, **frozen})))
    return {"params": params, **frozen}, history
