"""Channel-major flat-lane ConvLSTM kernels: interpret-mode correctness vs the
XLA reference, layout round-trips, VJP routing, and the ConvLSTMCore "cmajor"
decoder's equivalence to the "fused" decoder on a shared param tree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import satflow_tpu.ops.pallas.cmajor_convlstm as CM
from satflow_tpu.ops.pallas.fused_convlstm_step import _step_ref


@pytest.fixture
def rng():
    return jax.random.PRNGKey(7)


def _cell_inputs(rng, b=2, hgt=16, wdt=128, cx=8, ch=8):
    ks = jax.random.split(rng, 6)
    x = jax.random.normal(ks[0], (b, hgt, wdt, cx))
    h = jax.random.normal(ks[1], (b, hgt, wdt, ch))
    c = jax.random.normal(ks[2], (b, hgt, wdt, ch))
    wx = jax.random.normal(ks[3], (3, 3, cx, 4 * ch)) * 0.1
    wh = jax.random.normal(ks[4], (3, 3, ch, 4 * ch)) * 0.1
    bias = jax.random.normal(ks[5], (4 * ch,)) * 0.1
    return x, h, c, wx, wh, bias


def test_layout_round_trip(rng):
    x = jax.random.normal(rng, (2, 8, 128, 8))
    for bh in (2, 4, 8):
        back = CM.from_cmajor(CM.to_cmajor(x, bh), 8, 128, bh)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # stacked-sequence convert == per-step converts
    seq = jax.random.normal(rng, (2, 3, 8, 128, 8))
    flat = jnp.stack([CM.to_cmajor(seq[:, t], 4) for t in range(3)], axis=1)
    np.testing.assert_array_equal(
        np.asarray(CM.from_cmajor_seq(flat, 8, 128, 4)), np.asarray(seq)
    )


def test_interpret_cell_matches_reference(rng, monkeypatch):
    monkeypatch.setattr(CM, "_INTERPRET", True)
    args = _cell_inputs(rng)
    h_ref, c_ref = _step_ref(*args)
    bh = 4
    xc, hc, cc = (CM.to_cmajor(a, bh) for a in args[:3])
    h_k, c_k = CM.cmajor_convlstm_step(xc, hc, cc, *args[3:], bh, 16, 128)
    np.testing.assert_allclose(
        np.asarray(CM.from_cmajor(h_k, 16, 128, bh)), np.asarray(h_ref),
        atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(CM.from_cmajor(c_k, 16, 128, bh)), np.asarray(c_ref),
        atol=2e-5)
    # pad-row blocks come back zeroed: the carries are scan-stable
    sp_rows = h_k.reshape(2, 8, 16 + 2 * bh, 128)
    assert float(jnp.abs(sp_rows[:, :, :bh]).max()) == 0.0
    assert float(jnp.abs(sp_rows[:, :, -bh:]).max()) == 0.0


def test_interpret_conv_head_matches_reference(rng, monkeypatch):
    monkeypatch.setattr(CM, "_INTERPRET", True)
    ks = jax.random.split(rng, 3)
    x = jax.random.normal(ks[0], (2, 16, 128, 8))
    w = jax.random.normal(ks[1], (3, 3, 8, 12)) * 0.1
    b = jax.random.normal(ks[2], (12,)) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    out = CM.cmajor_conv3x3(CM.to_cmajor(x, 4), w, b, 4, 16, 128)
    np.testing.assert_allclose(
        np.asarray(CM.from_cmajor(out, 16, 128, 4)), np.asarray(ref),
        atol=2e-5)


def test_vjp_matches_reference_autodiff(rng):
    """The custom VJP (routed through the NHWC reference step) == autodiff of
    the same math done natively in NHWC."""
    args = _cell_inputs(rng, b=1, hgt=8, wdt=128)
    bh = 4

    def f_cmajor(x, h, c, wx, wh, b):
        xc, hc, cc = (CM.to_cmajor(a, bh) for a in (x, h, c))
        h2, c2 = CM.cmajor_convlstm_step(xc, hc, cc, wx, wh, b, bh, 8, 128)
        return jnp.sum(CM.from_cmajor(h2, 8, 128, bh) ** 2)

    def f_ref(x, h, c, wx, wh, b):
        h2, _ = _step_ref(x, h, c, wx, wh, b)
        return jnp.sum(h2 ** 2)

    g_cm = jax.grad(f_cmajor, argnums=(1, 3))(*args)
    g_rf = jax.grad(f_ref, argnums=(1, 3))(*args)
    for a, b_ in zip(g_cm, g_rf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_supported_geometry_gate():
    assert CM.cmajor_supported(256, 256, 64, 64)
    assert not CM.cmajor_supported(256, 100, 64)     # W not lane-tiled
    assert not CM.cmajor_supported(256, 256, 12)     # channels not sublane-tiled
    assert CM.default_block_h(256) >= 1
    assert 250 % CM.default_block_h(250) == 0        # always divides H


def test_core_cmajor_matches_fused(rng):
    """ConvLSTMCore(cell_impl="cmajor") on a fused-initialized param tree ==
    the fused rollout: same tree (checkpoint interchange), same math."""
    from satflow_tpu.models.conv_lstm import ConvLSTMCore

    x = jax.random.uniform(rng, (1, 2, 8, 128, 4))
    kw = dict(hidden_dim=8, out_channels=4, forecast_steps=3)
    m_f = ConvLSTMCore(cell_impl="fused", **kw)
    m_c = ConvLSTMCore(cell_impl="cmajor", **kw)
    v = m_f.init(rng, x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        m_c.init(rng, x))
    yf = m_f.apply(v, x)
    yc = m_c.apply(v, x)
    assert yc.shape == yf.shape == (1, 3, 8, 128, 4)
    np.testing.assert_allclose(np.asarray(yc), np.asarray(yf), atol=2e-5)


def test_core_cmajor_unsupported_geometry_degrades_to_fused(rng):
    """At a geometry the C-major kernels decline (W=64), "cmajor" must run
    the fused decoder — identical outputs, no error."""
    from satflow_tpu.models.conv_lstm import ConvLSTMCore

    x = jax.random.uniform(rng, (1, 2, 8, 64, 4))
    kw = dict(hidden_dim=8, out_channels=4, forecast_steps=2)
    m_f = ConvLSTMCore(cell_impl="fused", **kw)
    m_c = ConvLSTMCore(cell_impl="cmajor", **kw)
    v = m_f.init(rng, x)
    np.testing.assert_allclose(
        np.asarray(m_c.apply(v, x)), np.asarray(m_f.apply(v, x)), atol=2e-5)
