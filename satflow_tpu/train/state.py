"""Train states: pytree containers for params, model state, and optimizer state.

The functional replacement for the mutable Lightning module+optimizer pair. A
``TrainState`` is a pure pytree, so the whole update is one compiled XLA program
and the state can be sharded by ``jax.sharding`` annotations (ZeRO-style optimizer
sharding = sharding the opt_state leaves; see satflow_tpu/parallel).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    """Single-optimizer train state (ConvLSTM/U-Net/MetNet/Perceiver family)."""

    step: jax.Array
    params: Any
    model_state: Dict[str, Any]  # batch_stats / spectral collections
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, model_state, tx):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            model_state=dict(model_state),
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads, new_model_state=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            model_state=new_model_state if new_model_state is not None else self.model_state,
            opt_state=new_opt_state,
        )


class GANTrainState(struct.PyTreeNode):
    """Two-optimizer state (generator + discriminator), one compiled step.

    The analog of Lightning's alternating ``optimizer_idx`` steps (reference
    satflow/models/cloudgan.py:244-248): both parameter sets and both optimizer
    states live in one pytree; the jitted GAN step computes both gradients and
    applies both updates in a single XLA program.
    """

    step: jax.Array
    g_params: Any
    d_params: Any
    model_state: Dict[str, Any]
    g_opt_state: optax.OptState
    d_opt_state: optax.OptState
    g_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    d_tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, g_params, d_params, model_state, g_tx, d_tx):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            d_params=d_params,
            model_state=dict(model_state),
            g_opt_state=g_tx.init(g_params),
            d_opt_state=d_tx.init(d_params),
            g_tx=g_tx,
            d_tx=d_tx,
        )

    def apply_g(self, grads, new_model_state=None):
        updates, new_opt = self.g_tx.update(grads, self.g_opt_state, self.g_params)
        return self.replace(
            g_params=optax.apply_updates(self.g_params, updates),
            g_opt_state=new_opt,
            model_state=new_model_state or self.model_state,
        )

    def apply_d(self, grads, new_model_state=None):
        updates, new_opt = self.d_tx.update(grads, self.d_opt_state, self.d_params)
        return self.replace(
            step=self.step + 1,
            d_params=optax.apply_updates(self.d_params, updates),
            d_opt_state=new_opt,
            model_state=new_model_state or self.model_state,
        )
