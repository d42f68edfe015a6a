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
    ``update(metric)`` each validation epoch and rewrites
    ``opt_state.hyperparams['learning_rate']`` to ``base_lr * scale``. The scale
    floor is ``min_lr / base_lr`` so the *learning rate* (not the dimensionless
    scale) is clamped at ``min_lr`` — the torch ReduceLROnPlateau semantics
    (reference cloudgan.py:335-347).
    """

    def __init__(self, base_lr: float = 1.0, factor: float = 0.5,
                 patience: int = 5, min_lr: float = 1e-7):
        self.base_lr = base_lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.bad_epochs = 0
        self.scale = 1.0

    def update(self, metric: float) -> float:
        """Feed the monitored metric; returns the current scale."""
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                floor = self.min_lr / max(self.base_lr, 1e-30)
                self.scale = max(self.scale * self.factor, min(floor, 1.0))
                self.bad_epochs = 0
        return self.scale

    @property
    def lr(self) -> float:
        return self.base_lr * self.scale


def rewrite_learning_rate(opt_state, new_lr: float):
    """Rewrite every ``inject_hyperparams`` learning_rate inside an optax state
    pytree (handles chain/MultiSteps wrapping). Returns the updated state."""
    import jax
    import jax.numpy as jnp

    def visit(node):
        hp = getattr(node, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            old = hp["learning_rate"]
            hp = dict(hp)
            hp["learning_rate"] = jnp.asarray(new_lr, jnp.asarray(old).dtype)
            return node._replace(hyperparams=hp)
        if isinstance(node, tuple) and type(node) is tuple:
            return tuple(visit(c) for c in node)
        if hasattr(node, "_fields"):  # namedtuple optax state
            return node._replace(**{f: visit(getattr(node, f)) for f in node._fields
                                    if _is_state_like(getattr(node, f))})
        return node

    def _is_state_like(v):
        return isinstance(v, tuple) or hasattr(v, "_fields")

    return visit(opt_state)
