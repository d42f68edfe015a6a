"""Fused ConvLSTM-step kernel: interpret-mode correctness vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import satflow_tpu.ops.pallas.fused_convlstm_step as F


def _random_inputs(rng, b=2, hgt=16, wdt=16, cx=4, ch=8):
    ks = jax.random.split(rng, 6)
    x = jax.random.normal(ks[0], (b, hgt, wdt, cx))
    h = jax.random.normal(ks[1], (b, hgt, wdt, ch))
    c = jax.random.normal(ks[2], (b, hgt, wdt, ch))
    wx = jax.random.normal(ks[3], (3, 3, cx, 4 * ch)) * 0.1
    wh = jax.random.normal(ks[4], (3, 3, ch, 4 * ch)) * 0.1
    bias = jax.random.normal(ks[5], (4 * ch,)) * 0.1
    return x, h, c, wx, wh, bias


def test_interpret_kernel_matches_reference(rng, monkeypatch):
    monkeypatch.setattr(F, "_INTERPRET", True)
    args = _random_inputs(rng)
    h_ref, c_ref = F._step_ref(*args)
    h_k, c_k = F.fused_convlstm_step(*args, use_pallas=True)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref), atol=2e-5)


def test_interpret_kernel_boundary_rows(rng, monkeypatch):
    """Halo masking: top/bottom image rows must match the zero-padded conv."""
    monkeypatch.setattr(F, "_INTERPRET", True)
    args = _random_inputs(rng, b=1, hgt=8, wdt=8, cx=3, ch=8)  # single row-block
    h_ref, _ = F._step_ref(*args)
    h_k, _ = F.fused_convlstm_step(*args, use_pallas=True)
    np.testing.assert_allclose(
        np.asarray(h_k[0, 0]), np.asarray(h_ref[0, 0]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(h_k[0, -1]), np.asarray(h_ref[0, -1]), atol=2e-5
    )


def test_fallback_cpu_path(rng):
    args = _random_inputs(rng)
    h1, c1 = F.fused_convlstm_step(*args)  # auto: fallback on CPU
    h2, c2 = F._step_ref(*args)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)


def test_vjp_matches_autodiff(rng):
    args = _random_inputs(rng, b=1, hgt=8, wdt=8, cx=2, ch=8)

    def loss_fused(*a):
        h, c = F.fused_convlstm_step(*a, use_pallas=False)
        return jnp.sum(h * h) + jnp.sum(c)

    def loss_ref(*a):
        h, c = F._step_ref(*a)
        return jnp.sum(h * h) + jnp.sum(c)

    g1 = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
