"""LR schedules: warmup-cosine, cosine, plateau — the reference's scheduler set.

- LinearWarmupCosineAnnealingLR (pl_bolts; reference satflow/models/pl_metnet.py:77-88)
  → ``warmup_cosine``.
- CosineAnnealing / ReduceLROnPlateau options in the GAN models (reference
  cloudgan.py:335-362) → ``cosine`` and the engine-side ``PlateauScheduler``
  (plateau needs a metric, so it lives outside the pure optax chain).
"""

from __future__ import annotations

from typing import Optional

import optax


def warmup_cosine(
    lr: float,
    warmup_steps: int = 1000,
    total_steps: int = 100_000,
    warmup_start_lr: float = 1e-8,
    eta_min: float = 1e-8,
) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=warmup_start_lr,
        peak_value=lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=eta_min,
    )


def cosine(lr: float, total_steps: int = 100_000, eta_min: float = 1e-8) -> optax.Schedule:
    return optax.cosine_decay_schedule(lr, total_steps, alpha=eta_min / max(lr, 1e-12))


def constant(lr: float) -> optax.Schedule:
    return optax.constant_schedule(lr)


def make_schedule(name: Optional[str], lr: float, **kwargs) -> optax.Schedule:
    if name in (None, "", "constant", "none"):
        return constant(lr)
    if name == "warmup_cosine":
        return warmup_cosine(lr, **kwargs)
    if name == "cosine":
        return cosine(lr, **kwargs)
    raise ValueError(f"Unknown schedule {name!r}")


class PlateauScheduler:
    """ReduceLROnPlateau as an engine-side multiplier on an injectable scale.

    Works with ``optax.inject_hyperparams``-wrapped optimizers: the engine calls
    ``update(metric)`` each validation epoch and writes the decayed scale into
    ``opt_state.hyperparams['learning_rate']``.
    """

    def __init__(self, factor: float = 0.5, patience: int = 5, min_lr: float = 1e-7):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.bad_epochs = 0
        self.scale = 1.0

    def update(self, metric: float) -> float:
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.scale
