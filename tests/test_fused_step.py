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


def test_interpret_halo_variant_matches_reference(rng, monkeypatch):
    """Single-fetch halo-tensor kernel == reference, incl. boundary rows."""
    monkeypatch.setattr(F, "_INTERPRET", True)
    for shape in [dict(b=2, hgt=16, wdt=16, cx=4, ch=8),
                  dict(b=1, hgt=8, wdt=8, cx=3, ch=8)]:
        args = _random_inputs(rng, **shape)
        h_ref, c_ref = F._step_ref(*args)
        h_k, c_k = F._step_pallas_halo(*args)
        np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_ref), atol=2e-5)
        np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref), atol=2e-5)


def test_build_halo_rows(rng):
    xp = jax.random.normal(rng, (2, 16, 10, 4))
    halo = F._build_halo(xp, 8)
    assert halo.shape == (2, 2, 2, 10, 4)
    np.testing.assert_array_equal(np.asarray(halo[:, 0, 0]), 0.0)  # top edge
    np.testing.assert_array_equal(np.asarray(halo[:, 1, 1]), 0.0)  # bottom edge
    np.testing.assert_allclose(np.asarray(halo[:, 0, 1]), np.asarray(xp[:, 8]))
    np.testing.assert_allclose(np.asarray(halo[:, 1, 0]), np.asarray(xp[:, 7]))


def test_interpret_padded_step_matches_reference(rng, monkeypatch):
    """Padded-IO kernel (h in (W+2) layout across scans) == reference."""
    monkeypatch.setattr(F, "_INTERPRET", True)
    x, h, c, wx, wh, bias = _random_inputs(rng, b=2, hgt=16, wdt=16, cx=4, ch=8)
    xp, hp = F._pad_w(x), F._pad_w(h)
    h_ref, c_ref = F._step_ref(x, h, c, wx, wh, bias)
    hp_k, c_k = F.fused_convlstm_step_padded(xp, hp, c, wx, wh, bias,
                                             use_pallas=True)
    assert hp_k.shape == (2, 16, 18, 8)
    np.testing.assert_allclose(np.asarray(hp_k[:, :, 1:-1]), np.asarray(h_ref),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(hp_k[:, :, 0]), 0.0)
    np.testing.assert_array_equal(np.asarray(hp_k[:, :, -1]), 0.0)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref), atol=2e-5)


def test_padded_step_vjp_matches_autodiff(rng):
    """Grad through the padded step's custom VJP == autodiff of the plain
    reference step (halo-column cotangents are constants and drop)."""
    x, h, c, wx, wh, bias = _random_inputs(rng, b=1, hgt=8, wdt=8, cx=2, ch=8)

    def loss_padded(x, h, c, wx, wh, bias):
        hp, cn = F.fused_convlstm_step_padded(
            F._pad_w(x), F._pad_w(h), c, wx, wh, bias, use_pallas=False
        )
        return jnp.sum(hp[:, :, 1:-1] ** 2) + jnp.sum(cn * cn)

    def loss_ref(x, h, c, wx, wh, bias):
        hn, cn = F._step_ref(x, h, c, wx, wh, bias)
        return jnp.sum(hn * hn) + jnp.sum(cn * cn)

    g1 = jax.grad(loss_padded, argnums=tuple(range(6)))(x, h, c, wx, wh, bias)
    g2 = jax.grad(loss_ref, argnums=tuple(range(6)))(x, h, c, wx, wh, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


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


def test_gate_bwd_ref_matches_autodiff(rng):
    """The hand-derived gate backward (the Pallas kernel's math) must equal
    jax.vjp of the reference step for every input cotangent."""
    args = _random_inputs(rng, b=2, hgt=8, wdt=8, cx=3, ch=8)
    x, h, c, wx, wh, bias = args
    k1, k2 = jax.random.split(rng)
    dh_next = jax.random.normal(k1, c.shape)
    dc_next = jax.random.normal(k2, c.shape)

    _, vjp = jax.vjp(lambda *a: F._step_ref(*a), *args)
    dx_r, dh_r, dc_r, dwx_r, dwh_r, db_r = vjp((dh_next, dc_next))

    dx, dh, dc_prev, dwx, dwh, db = F._bwd(
        False, args, (dh_next, dc_next)
    )
    for got, ref in [(dx, dx_r), (dh, dh_r), (dc_prev, dc_r),
                     (dwx, dwx_r), (dwh, dwh_r), (db, db_r)]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_interpret_bwd_kernel_matches_ref(rng, monkeypatch):
    """Pallas backward kernel (interpret mode) == the XLA gate-backward."""
    monkeypatch.setattr(F, "_INTERPRET", True)
    args = _random_inputs(rng, b=2, hgt=16, wdt=16, cx=4, ch=8)
    x, h, c, wx, wh, bias = args
    k1, k2 = jax.random.split(rng)
    dh_next = jax.random.normal(k1, c.shape)
    dc_next = jax.random.normal(k2, c.shape)
    dg_ref, dc_ref = F._gate_bwd_ref(x, h, c, wx, wh, bias, dh_next, dc_next)
    dg_k, dc_k = F._gate_bwd_pallas(x, h, c, wx, wh, bias, dh_next, dc_next)
    np.testing.assert_allclose(np.asarray(dg_k), np.asarray(dg_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dc_k), np.asarray(dc_ref), atol=2e-5)


def test_interpret_padded_bwd_kernel_matches_ref(rng, monkeypatch):
    monkeypatch.setattr(F, "_INTERPRET", True)
    x, h, c, wx, wh, bias = _random_inputs(rng, b=2, hgt=16, wdt=16, cx=4, ch=8)
    xp, hp = F._pad_w(x), F._pad_w(h)
    k1, k2 = jax.random.split(rng)
    dhp = jax.random.normal(k1, hp.shape[:-1] + (8,))
    dc = jax.random.normal(k2, c.shape)
    dg_ref, dc_ref = F._gate_bwd_ref_padded(xp, hp, c, wx, wh, bias, dhp, dc)
    dg_k, dc_k = F._gate_bwd_pallas(xp, hp, c, wx, wh, bias, dhp, dc,
                                    padded=True)
    np.testing.assert_allclose(np.asarray(dg_k), np.asarray(dg_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dc_k), np.asarray(dc_ref), atol=2e-5)


def test_padded_scan_grad_matches_plain_scan(rng):
    """Two chained padded steps (scan-style) must produce the same gradients
    as two chained plain steps — validates the halo-cotangent dropping."""
    x0, h, c, wx, wh, bias = _random_inputs(rng, b=1, hgt=8, wdt=8, cx=8, ch=8)

    def loss_plain(h, c, wx):
        h1, c1 = F._step_ref(x0, h, c, wx, wh, bias)
        h2, c2 = F._step_ref(h1, h1, c1, wx, wh, bias)
        return jnp.sum(h2 * h2)

    def loss_padded(h, c, wx):
        hp, cp = F._pad_w(h), c
        xp = F._pad_w(x0)
        h1, c1 = F.fused_convlstm_step_padded(xp, hp, cp, wx, wh, bias,
                                              use_pallas=False)
        h2, c2 = F.fused_convlstm_step_padded(h1, h1, c1, wx, wh, bias,
                                              use_pallas=False)
        return jnp.sum(h2[:, :, 1:-1] ** 2)

    g1 = jax.grad(loss_plain, argnums=(0, 1, 2))(h, c, wx)
    g2 = jax.grad(loss_padded, argnums=(0, 1, 2))(h, c, wx)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_full_custom_vjp_pallas_interpret(rng, monkeypatch):
    """End-to-end grad through the custom VJP with the Pallas path forced
    (interpret mode) equals autodiff of the reference step."""
    monkeypatch.setattr(F, "_INTERPRET", True)
    args = _random_inputs(rng, b=1, hgt=8, wdt=8, cx=8, ch=8)

    def loss_pallas(*a):
        h, c = F.fused_convlstm_step(*a, use_pallas=True)
        return jnp.sum(h * h) + jnp.sum(c * c)

    def loss_ref(*a):
        h, c = F._step_ref(*a)
        return jnp.sum(h * h) + jnp.sum(c * c)

    g1 = jax.grad(loss_pallas, argnums=tuple(range(6)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_block_pick_scales_proportionally(monkeypatch):
    """The byte budget scales with the VMEM limit in BOTH directions and the
    conservative (dispatch-guard) pick never exceeds the 16 MiB-calibrated
    one (advisor r3: an 8 MiB override must shrink picked blocks, a 63 MiB
    one must scale ~3.9x not 3x, and a raised limit must not flip guards)."""
    pick = F._pick_block_h
    # legacy limit (env 0 -> compiler default): the r2-proven picks
    monkeypatch.setenv("SATFLOW_VMEM_LIMIT_BYTES", "0")
    assert pick(256, 256, 64, 64, None, 2) == 8
    assert pick(1024, 1024, 64, 64, None, 2) == 2
    assert pick(2048, 2048, 64, 64, None, 2) == 1
    # default raised limit (64 MiB): 4x budget
    monkeypatch.delenv("SATFLOW_VMEM_LIMIT_BYTES")
    assert pick(256, 256, 64, 64, None, 2) == 32
    # conservative pick is capped at the 16 MiB calibration regardless
    assert pick(256, 256, 64, 64, None, 2, conservative=True) == 8
    assert pick(2048, 2048, 64, 64, None, 2, conservative=True) == 1
    # a LOWERED limit shrinks both the block pick and the guard pick
    monkeypatch.setenv("SATFLOW_VMEM_LIMIT_BYTES", str(8 * 1024 * 1024))
    assert pick(256, 256, 64, 64, None, 2) == 4
    assert pick(256, 256, 64, 64, None, 2, conservative=True) == 4
    # proportional (not integer-floored) scaling at a non-multiple limit
    monkeypatch.setenv("SATFLOW_VMEM_LIMIT_BYTES", str(63 * 1024 * 1024))
    assert pick(1024, 1024, 64, 64, None, 2) == 4  # 3.94x budget -> pick 4
    # explicit request and SATFLOW_BLOCK_H still bypass the budget entirely
    monkeypatch.setenv("SATFLOW_BLOCK_H", "16")
    assert pick(256, 256, 64, 64, None, 2) == 16


def test_cmajor_prototype_matches_reference():
    """The channel-major carry-layout prototype (tools/exp_cmajor.py — the
    r2 ceiling study's recorded layout lever, measured in r5) computes the
    exact ConvLSTM step: nine aligned gate-major matmuls + two lane rolls
    must match the NHWC reference conv, including both W-boundary columns
    and the top/bottom halo rows."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "tools", "exp_cmajor.py")
    spec = importlib.util.spec_from_file_location("exp_cmajor", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.verify()  # interpret mode; asserts max|err| internally
    mod.verify(bsz=1, height=16, width=8, ch=4, block_h=4)
