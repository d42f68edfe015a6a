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


def test_auto_dispatch_regime(rng, monkeypatch):
    """Auto-dispatch follows the measured v5e regime: kernel only for long
    axes with MXU-deep heads (L>=128, d>=64); XLA for thin heads."""
    import satflow_tpu.ops.pallas.axial_attention as A

    calls = []
    monkeypatch.setattr(A, "_attention_pallas",
                        lambda q, k, v: calls.append("pallas") or A._attention_ref(q, k, v))
    monkeypatch.setattr(A, "pallas_available", lambda: True)
    import jax

    def run(n, L, d):
        calls.clear()
        q = jax.random.normal(rng, (n, L, d))
        A.axial_attention(q, q, q)
        return bool(calls)

    assert not run(8, 64, 8)     # MetNet thin heads -> XLA
    assert not run(8, 64, 64)    # short axis -> XLA
    assert run(8, 128, 64)       # long axis, deep head -> kernel
    assert run(8, 256, 64)
