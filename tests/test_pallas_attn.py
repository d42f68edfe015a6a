"""Axial-attention kernel tests (CPU fallback correctness + VJP)."""

import jax
import jax.numpy as jnp
import numpy as np

from satflow_tpu.ops.pallas.axial_attention import _attention_ref, axial_attention


def test_fallback_is_softmax_attention(rng):
    q = jax.random.normal(rng, (6, 16, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (6, 16, 8))
    v = jax.random.normal(jax.random.PRNGKey(2), (6, 16, 8))
    out = axial_attention(q, k, v, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_attention_ref(q, k, v)), atol=1e-6
    )
    # attention over identical keys = mean of values
    k1 = jnp.zeros_like(k)
    out_uniform = axial_attention(q, k1, v, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(out_uniform), np.asarray(jnp.mean(v, axis=1, keepdims=True))
        * np.ones_like(v), atol=1e-5
    )


def test_vjp_matches_autodiff(rng):
    q = jax.random.normal(rng, (2, 8, 4))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 4))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 4))

    g1 = jax.grad(lambda q, k, v: jnp.sum(axial_attention(q, k, v, False) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: jnp.sum(_attention_ref(q, k, v) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_axial_module_still_works(rng):
    from satflow_tpu.nn.attention import AxialAttentionBlock

    x = jax.random.normal(rng, (2, 8, 8, 16))
    block = AxialAttentionBlock(heads=4, axes=(-3, -2))
    variables = block.init(rng, x)
    y = block.apply(variables, x)
    assert y.shape == x.shape and bool(jnp.all(jnp.isfinite(y)))
