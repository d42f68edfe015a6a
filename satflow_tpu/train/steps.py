"""Jitted train/eval steps: one compiled XLA program per model family.

TPU semantics: the step function is jitted once with donated state buffers
(``donate_argnums``) so parameter/optimizer memory is updated in place in HBM;
under a multi-device mesh the batch arrives sharded on its leading dim and XLA
emits the gradient all-reduce over ICI automatically. Gradient accumulation is
handled by wrapping the optimizer in ``optax.MultiSteps`` (the reference's
``accumulate_grad_batches``, configs/trainer/default.yaml:20).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from satflow_tpu.train.state import GANTrainState, TrainState


def make_train_step(model) -> Callable:
    """Build the single-optimizer train step for a BaseModel."""

    def train_step(state: TrainState, batch, rng: jax.Array):
        def loss_fn(params):
            loss, (metrics, new_model_state) = model.loss(
                params, state.model_state, batch, rng, train=True
            )
            return loss, (metrics, new_model_state)

        grads, (metrics, new_model_state) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_model_state)
        metrics["grad_norm"] = optax_global_norm(grads)
        # In-step NaN guard (trainer terminate_on_nan, reference trainer
        # default.yaml:48): computed on-device so the engine can check every
        # step without recomputing anything.
        metrics["finite"] = jnp.isfinite(metrics["loss"]) & jnp.isfinite(
            metrics["grad_norm"]
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model) -> Callable:
    def eval_step(state: TrainState, batch, rng: jax.Array):
        _, (metrics, _) = model.loss(
            state.params, state.model_state, batch, rng, train=False
        )
        return metrics

    return jax.jit(eval_step)


def make_gan_train_step(model, mode: str = "fused") -> Callable:
    """Two-optimizer adversarial step, compiled as one or two XLA programs.

    Replaces Lightning's per-batch alternating optimizer closure (reference
    cloudgan.py:244-248, pix2pix.py:128-150): discriminator grads are taken at the
    current generator output (stop-gradient through G), then generator grads
    against the updated-discriminator-free objective.

    ``mode``:
      - ``"fused"`` (default): both updates apply in one compiled step —
        matches per-batch alternation at half the step launches. Best for
        small/medium geometries where the combined program compiles fast.
      - ``"split"``: D-step and G-step are separate jits, mirroring
        Lightning's two optimizer closures (reference cloudgan.py:244-248 —
        two `optimizer_idx` branches, never one program). Two much smaller
        XLA programs: at DGMR reference scale (128px F24) the fused program's
        single jit holds disc_steps+1 optimizer applications plus the
        num_samples generator rollouts and blows a >15-min compile budget;
        the split halves compile memory/time at the cost of one extra launch
        per step (negligible against a hundreds-of-ms adversarial round).
        RNG splits are identical to fused mode, so the two modes are
        numerically equivalent (gated by tests/test_engine.py).

    ``model.disc_steps`` (default 1) runs N discriminator updates per
    generator update — DGMR trains its dual discriminator twice per
    generator step (Ravuri et al.; the reference's skillful_nowcasting
    dependency does the same).
    """
    disc_steps = int(getattr(model, "disc_steps", 1))
    if disc_steps < 1:
        # a frozen discriminator (disc_steps=0) would leave d_metrics unbound
        # below AND silently train the generator against a random critic —
        # freeze by setting disc_lr=0 instead, which keeps the metrics real
        raise ValueError(
            f"disc_steps must be >= 1 (got {disc_steps}); to freeze the "
            "discriminator use disc_lr=0"
        )
    if mode not in ("fused", "split"):
        raise ValueError(f"gan step mode must be 'fused' or 'split' (got {mode!r})")
    if mode == "split":
        return _make_split_gan_train_step(model, disc_steps)

    def train_step(state: GANTrainState, batch, rng: jax.Array):
        rng_g, rng_d, rng_gp = jax.random.split(rng, 3)

        d_metrics = None
        for i in range(disc_steps):
            rng_di = jax.random.fold_in(rng_d, i)

            def d_loss_fn(d_params, _rng=rng_di, _state=None):
                loss, (metrics, new_model_state) = model.discriminator_loss(
                    state.g_params, d_params, state.model_state, batch,
                    _rng, rng_gp
                )
                return loss, (metrics, new_model_state)

            d_grads, (d_metrics, new_model_state) = jax.grad(
                d_loss_fn, has_aux=True
            )(state.d_params)
            state = state.apply_d(d_grads, new_model_state)

        def g_loss_fn(g_params):
            loss, (metrics, new_model_state) = model.generator_loss(
                g_params, state.d_params, state.model_state, batch, rng_g
            )
            return loss, (metrics, new_model_state)

        g_grads, (g_metrics, new_model_state) = jax.grad(g_loss_fn, has_aux=True)(
            state.g_params
        )
        state = state.apply_g(g_grads, new_model_state)

        metrics = {**{f"d_{k}": v for k, v in d_metrics.items()},
                   **{f"g_{k}": v for k, v in g_metrics.items()}}
        metrics["finite"] = jnp.isfinite(d_metrics["loss"]) & jnp.isfinite(
            g_metrics["loss"]
        )
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def _make_split_gan_train_step(model, disc_steps: int) -> Callable:
    """Split-mode GAN step: one jit per optimizer (see make_gan_train_step).

    The returned callable has the fused step's exact signature and RNG
    derivation; it dispatches the D jit then the G jit, threading the donated
    GANTrainState between them, and merges metrics. The tiny `finite` AND is
    the only eager op per step.
    """

    def d_step(state: GANTrainState, batch, rng_d: jax.Array, rng_gp: jax.Array):
        d_metrics = None
        for i in range(disc_steps):
            rng_di = jax.random.fold_in(rng_d, i)

            def d_loss_fn(d_params, _rng=rng_di, _state=state):
                loss, (metrics, new_model_state) = model.discriminator_loss(
                    _state.g_params, d_params, _state.model_state, batch,
                    _rng, rng_gp
                )
                return loss, (metrics, new_model_state)

            d_grads, (d_metrics, new_model_state) = jax.grad(
                d_loss_fn, has_aux=True
            )(state.d_params)
            state = state.apply_d(d_grads, new_model_state)
        return state, d_metrics

    def g_step(state: GANTrainState, batch, rng_g: jax.Array):
        def g_loss_fn(g_params):
            loss, (metrics, new_model_state) = model.generator_loss(
                g_params, state.d_params, state.model_state, batch, rng_g
            )
            return loss, (metrics, new_model_state)

        g_grads, (g_metrics, new_model_state) = jax.grad(g_loss_fn, has_aux=True)(
            state.g_params
        )
        return state.apply_g(g_grads, new_model_state), g_metrics

    d_jit = jax.jit(d_step, donate_argnums=(0,))
    g_jit = jax.jit(g_step, donate_argnums=(0,))

    def train_step(state: GANTrainState, batch, rng: jax.Array):
        rng_g, rng_d, rng_gp = jax.random.split(rng, 3)
        state, d_metrics = d_jit(state, batch, rng_d, rng_gp)
        state, g_metrics = g_jit(state, batch, rng_g)
        metrics = {**{f"d_{k}": v for k, v in d_metrics.items()},
                   **{f"g_{k}": v for k, v in g_metrics.items()}}
        metrics["finite"] = jnp.isfinite(d_metrics["loss"]) & jnp.isfinite(
            g_metrics["loss"]
        )
        return state, metrics

    # expose the two compiled halves so benches/tools can time/compile-check
    # them independently (tools/bench_train.py --model dgmr)
    train_step.d_jit = d_jit
    train_step.g_jit = g_jit
    return train_step


def make_gan_eval_step(model) -> Callable:
    def eval_step(state: GANTrainState, batch, rng: jax.Array):
        rng_g, rng_d, rng_gp = jax.random.split(rng, 3)
        _, (g_metrics, _) = model.generator_loss(
            state.g_params, state.d_params, state.model_state, batch, rng_g
        )
        _, (d_metrics, _) = model.discriminator_loss(
            state.g_params, state.d_params, state.model_state, batch, rng_d, rng_gp
        )
        return {**{f"d_{k}": v for k, v in d_metrics.items()},
                **{f"g_{k}": v for k, v in g_metrics.items()}}

    return jax.jit(eval_step)


def optax_global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))
