"""Numerical parity vs independent torch implementations.

The reference stack is torch-based; these tests build the same math in torch
(written inline here, not imported from the reference) with IDENTICAL weights
and assert our JAX layers produce the same numbers. This is the golden-value
layer of the test strategy (SURVEY §4: "exceed with numerical parity tests").
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def test_convlstm_cell_matches_torch(rng):
    """Fused-gate ConvLSTM cell == torch conv2d + i,f,o,g gate math."""
    from satflow_tpu.nn.recurrent import ConvLSTMCell

    cin, hidden, hw = 3, 5, 7
    cell = ConvLSTMCell(features=hidden, fused_gates=False)
    x = jax.random.normal(rng, (2, hw, hw, cin))
    h0 = jax.random.normal(jax.random.PRNGKey(1), (2, hw, hw, hidden))
    c0 = jax.random.normal(jax.random.PRNGKey(2), (2, hw, hw, hidden))
    variables = cell.init(rng, (h0, c0), x)
    kernel = np.asarray(variables["params"]["gates"]["kernel"])  # (3,3,cin+h,4h)
    bias = np.asarray(variables["params"]["gates"]["bias"])

    (h1, c1), _ = cell.apply(variables, (h0, c0), x)

    # torch equivalent: NCHW conv with the same weights
    tw = torch.tensor(kernel).permute(3, 2, 0, 1)  # (4h, cin+h, 3, 3)
    tb = torch.tensor(bias)
    tx = torch.tensor(np.asarray(x)).permute(0, 3, 1, 2)
    th = torch.tensor(np.asarray(h0)).permute(0, 3, 1, 2)
    tc = torch.tensor(np.asarray(c0)).permute(0, 3, 1, 2)
    with torch.no_grad():
        gates = torch.nn.functional.conv2d(
            torch.cat([tx, th], dim=1), tw, tb, padding=1
        )
        i, f, o, g = torch.split(gates, hidden, dim=1)
        tc1 = torch.sigmoid(f) * tc + torch.sigmoid(i) * torch.tanh(g)
        th1 = torch.sigmoid(o) * torch.tanh(tc1)
    np.testing.assert_allclose(
        np.asarray(h1), th1.permute(0, 2, 3, 1).numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(c1), tc1.permute(0, 2, 3, 1).numpy(), atol=2e-5
    )


def test_gan_loss_matches_torch_bce(rng):
    """Vanilla GANLoss == torch BCEWithLogits against constant labels."""
    from satflow_tpu.nn.losses import GANLoss

    pred = jax.random.normal(rng, (4, 6))
    tpred = torch.tensor(np.asarray(pred))
    gl = GANLoss("vanilla")
    for flag in (True, False):
        ours = float(gl(pred, flag))
        target = torch.full_like(tpred, 1.0 if flag else 0.0)
        theirs = float(
            torch.nn.functional.binary_cross_entropy_with_logits(tpred, target)
        )
        assert abs(ours - theirs) < 1e-5


def test_blurpool_matches_torch_conv(rng):
    """BlurPool == torch depthwise conv with the binomial kernel, stride 2."""
    from satflow_tpu.nn.conv import BlurPool, _binomial_filter

    x = jax.random.normal(rng, (1, 16, 16, 3))
    out = BlurPool(filter_size=4, stride=2).apply({}, x)

    f1 = _binomial_filter(4)
    f2 = np.outer(f1, f1)
    f2 = f2 / f2.sum()
    tw = torch.tensor(f2, dtype=torch.float32).view(1, 1, 4, 4).repeat(3, 1, 1, 1)
    tx = torch.tensor(np.asarray(x)).permute(0, 3, 1, 2)
    with torch.no_grad():
        tout = torch.nn.functional.conv2d(
            torch.nn.functional.pad(tx, (1, 2, 1, 2)), tw, stride=2, groups=3
        )
    np.testing.assert_allclose(
        np.asarray(out), tout.permute(0, 2, 3, 1).numpy(), atol=1e-5
    )


def test_instance_norm_matches_torch(rng):
    from satflow_tpu.nn.gan import InstanceNorm

    x = jax.random.normal(rng, (2, 8, 8, 4))
    ours = InstanceNorm().apply({}, x)
    tx = torch.tensor(np.asarray(x)).permute(0, 3, 1, 2)
    with torch.no_grad():
        theirs = torch.nn.functional.instance_norm(tx, eps=1e-5)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.permute(0, 2, 3, 1).numpy(), atol=1e-4
    )


def test_ssim_matches_torch_reference_impl(rng):
    """Our SSIM == an independent torch implementation of Wang et al. SSIM."""
    from satflow_tpu.ops.ssim import ssim, _gaussian_kernel1d

    x = jax.random.uniform(rng, (2, 32, 32, 1))
    y = jnp.clip(x + 0.05 * jax.random.normal(jax.random.PRNGKey(1), x.shape), 0, 1)
    ours = float(ssim(x, y))

    win = _gaussian_kernel1d(11, 1.5)
    w2 = torch.tensor(np.outer(win, win), dtype=torch.float64).view(1, 1, 11, 11)
    tx = torch.tensor(np.asarray(x), dtype=torch.float64).permute(0, 3, 1, 2)
    ty = torch.tensor(np.asarray(y), dtype=torch.float64).permute(0, 3, 1, 2)

    def blur(t):
        return torch.nn.functional.conv2d(t, w2)

    c1, c2 = 0.01**2, 0.03**2
    mx, my = blur(tx), blur(ty)
    sxx = blur(tx * tx) - mx * mx
    syy = blur(ty * ty) - my * my
    sxy = blur(tx * ty) - mx * my
    smap = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
        (mx * mx + my * my + c1) * (sxx + syy + c2)
    )
    theirs = float(smap.mean())
    assert abs(ours - theirs) < 1e-4
