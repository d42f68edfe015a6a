"""Pallas kernel tests (CPU: fallback correctness + custom VJP vs autodiff)."""

import jax
import jax.numpy as jnp
import numpy as np

from satflow_tpu.ops.pallas.fused_lstm import (
    _gates_ref,
    fused_lstm_gates,
    pallas_available,
)


def test_fallback_matches_reference(rng):
    gates = jax.random.normal(rng, (2, 8, 8, 32))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
    h1, c1 = fused_lstm_gates(gates, c, use_pallas=False)
    h2, c2 = _gates_ref(gates, c)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)


def test_custom_vjp_matches_autodiff(rng):
    gates = jax.random.normal(rng, (2, 4, 4, 16))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 4))

    def loss_custom(gates, c):
        h, cn = fused_lstm_gates(gates, c, use_pallas=False)
        return jnp.sum(h * h) + jnp.sum(jnp.abs(cn))

    def loss_ref(gates, c):
        h, cn = _gates_ref(gates, c)
        return jnp.sum(h * h) + jnp.sum(jnp.abs(cn))

    g1 = jax.grad(loss_custom, argnums=(0, 1))(gates, c)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(gates, c)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pallas_not_selected_on_cpu():
    assert pallas_available() is False  # conftest forces the CPU backend
