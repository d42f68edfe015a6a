"""Layer-library unit tests: shapes, NaN checks, and behavioral invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from satflow_tpu import nn as snn
from satflow_tpu.nn.recurrent import ConvGRUCell, ConvLSTMCell, SpatioTemporalLSTMCell


def _finite(x):
    return bool(jnp.all(jnp.isfinite(x)))


class TestConvFactory:
    def test_coordconv_appends_coords(self, rng):
        x = jnp.ones((2, 8, 8, 3))
        layer = snn.AddCoords()
        y = layer.apply({}, x)
        assert y.shape == (2, 8, 8, 5)
        # corner coords are -1/1
        np.testing.assert_allclose(y[0, 0, 0, 3:], [-1.0, -1.0])
        np.testing.assert_allclose(y[0, -1, -1, 3:], [1.0, 1.0])

    def test_coordconv_module(self, rng):
        x = jnp.ones((2, 8, 8, 3))
        layer = snn.CoordConv(features=16, kernel_size=3)
        params = layer.init(rng, x)
        y = layer.apply(params, x)
        assert y.shape == (2, 8, 8, 16) and _finite(y)

    def test_blurpool_downsamples(self, rng):
        x = jax.random.normal(rng, (2, 16, 16, 4))
        y = snn.BlurPool(stride=2).apply({}, x)
        assert y.shape == (2, 8, 8, 4) and _finite(y)

    def test_blurpool_preserves_constant(self):
        x = jnp.full((1, 16, 16, 2), 3.0)
        y = snn.BlurPool(stride=2).apply({}, x)
        # interior of a constant image stays constant under a normalized blur
        np.testing.assert_allclose(np.asarray(y[0, 2:-2, 2:-2]), 3.0, rtol=1e-5)

    def test_antialiased_conv(self, rng):
        x = jax.random.normal(rng, (2, 16, 16, 4))
        layer = snn.AntialiasedConv(features=8, kernel_size=3, strides=2)
        params = layer.init(rng, x)
        y = layer.apply(params, x)
        assert y.shape == (2, 8, 8, 8)


class TestRecurrentCells:
    @pytest.mark.parametrize("cell_cls,n_state", [(ConvLSTMCell, 2), (ConvGRUCell, 1)])
    def test_cell_step(self, rng, cell_cls, n_state):
        cell = cell_cls(features=16)
        x = jax.random.normal(rng, (2, 8, 8, 4))
        carry = cell_cls.init_carry(2, 8, 8, 16)
        params = cell.init(rng, carry, x)
        (new_carry), y = cell.apply(params, carry, x)[0], cell.apply(params, carry, x)[1]
        assert len(new_carry) == n_state
        assert y.shape == (2, 8, 8, 16) and _finite(y)

    def test_convlstm_scan_matches_loop(self, rng):
        """Scanned unroll must equal stepwise application (same weights)."""
        cell = ConvLSTMCell(features=8)
        xs = jax.random.normal(rng, (2, 5, 8, 8, 3))
        carry = ConvLSTMCell.init_carry(2, 8, 8, 8)
        params = cell.init(rng, carry, xs[:, 0])

        # manual loop
        c = carry
        outs = []
        for t in range(5):
            c, y = cell.apply(params, c, xs[:, t])
            outs.append(y)
        loop_out = jnp.stack(outs, axis=1)

        scanned = snn.scan_cell(ConvLSTMCell, features=8)
        scan_out = scanned.apply(params, carry, xs)[1]
        np.testing.assert_allclose(np.asarray(loop_out), np.asarray(scan_out), atol=1e-5)

    def test_stlstm_cell(self, rng):
        cell = SpatioTemporalLSTMCell(features=8, kernel_size=3)
        x = jax.random.normal(rng, (2, 8, 8, 4))
        carry = SpatioTemporalLSTMCell.init_carry(2, 8, 8, 8)
        params = cell.init(rng, carry, x)
        (h, c, m), (out, dc, dm) = cell.apply(params, carry, x)
        for t in (h, c, m, out, dc, dm):
            assert t.shape == (2, 8, 8, 8) and _finite(t)


class TestAttention:
    def test_sagan_attention_2d(self, rng):
        from satflow_tpu.nn.attention import SAGANAttention2d

        x = jax.random.normal(rng, (2, 8, 8, 16))
        layer = SAGANAttention2d()
        variables = layer.init(rng, x)
        y = layer.apply(variables, x)
        assert y.shape == x.shape and _finite(y)
        # gamma starts at 0 → identity at init (SAGAN convention)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_self_attention_3d(self, rng):
        from satflow_tpu.nn.attention import SelfAttention3d

        x = jax.random.normal(rng, (1, 4, 8, 8, 16))
        layer = SelfAttention3d()
        variables = layer.init(rng, x)
        y = layer.apply(variables, x)
        assert y.shape == x.shape and _finite(y)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_separable_attention_axes(self, rng):
        from satflow_tpu.nn.attention import SeparableAttention

        x = jax.random.normal(rng, (1, 4, 8, 8, 8))
        layer = SeparableAttention()
        variables = layer.init(rng, x)
        y = layer.apply(variables, x)
        assert y.shape == x.shape and _finite(y)

    def test_axial_attention_is_per_axis(self, rng):
        """Axial attention along W must not mix information across H rows."""
        from satflow_tpu.nn.attention import AxialSelfAttention

        x = jax.random.normal(rng, (1, 6, 8, 16))
        layer = AxialSelfAttention(heads=2, axis=-2)  # attend along W
        variables = layer.init(rng, x)
        y1 = layer.apply(variables, x)
        x2 = x.at[0, 0].set(jax.random.normal(jax.random.PRNGKey(9), (8, 16)))
        y2 = layer.apply(variables, x2)
        # rows 1.. unchanged when only row 0 is perturbed
        np.testing.assert_allclose(
            np.asarray(y1[0, 1:]), np.asarray(y2[0, 1:]), atol=1e-5
        )
        assert not np.allclose(np.asarray(y1[0, 0]), np.asarray(y2[0, 0]))

    def test_axial_attention_no_cross_batch_leak(self, rng):
        """Regression: -3 on NHWC once resolved to the BATCH axis."""
        from satflow_tpu.nn.attention import AxialSelfAttention

        x = jax.random.normal(rng, (2, 4, 4, 8))
        layer = AxialSelfAttention(heads=2, axis=-3)  # attend along H
        variables = layer.init(rng, x)
        y1 = layer.apply(variables, x)
        x2 = x.at[1].set(0.0)  # perturb sample 1 only
        y2 = layer.apply(variables, x2)
        np.testing.assert_allclose(np.asarray(y1[0]), np.asarray(y2[0]), atol=1e-6)

    def test_time_distributed_module(self, rng):
        from flax import linen as fnn

        from satflow_tpu.nn.misc import TimeDistributed

        inner = fnn.Dense(4)
        td = TimeDistributed(inner)
        x = jax.random.normal(rng, (2, 3, 5))
        variables = td.init(rng, x)
        y = td.apply(variables, x)
        assert y.shape == (2, 3, 4)
        # equals applying per timestep
        flat = inner.apply(
            {"params": variables["params"]["module"]}, x.reshape(6, 5)
        ).reshape(2, 3, 4)
        np.testing.assert_allclose(np.asarray(y), np.asarray(flat), atol=1e-6)

    def test_sn_dense_and_embed(self, rng):
        from satflow_tpu.nn.norm import SNDense, SNEmbed

        x = jax.random.normal(rng, (4, 8))
        layer = SNDense(6)
        variables = layer.init(rng, x)
        y, _ = layer.apply(variables, x, mutable=["spectral"])
        assert y.shape == (4, 6) and _finite(y)

        emb = SNEmbed(num_embeddings=5, features=8)
        variables = emb.init(rng, jnp.asarray([0, 3]))
        out, _ = emb.apply(variables, jnp.asarray([0, 3]), mutable=["spectral"])
        assert out.shape == (2, 8)


class TestNorms:
    def test_snconv_normalizes(self, rng):
        x = jax.random.normal(rng, (2, 8, 8, 4))
        layer = snn.SNConv(features=8, kernel_size=3)
        variables = layer.init(rng, x)
        y, updated = layer.apply(variables, x, mutable=["spectral"])
        assert y.shape == (2, 8, 8, 8) and _finite(y)
        # u vector must update under power iteration
        u0 = variables["spectral"]["sn"]["u"]
        u1 = updated["spectral"]["sn"]["u"]
        assert not np.allclose(np.asarray(u0), np.asarray(u1))

    def test_sn_reduces_spectral_norm(self, rng):
        """After several power iterations sigma(kernel_bar) ≈ 1."""
        x = jax.random.normal(rng, (2, 8, 8, 4))
        layer = snn.SNConv(features=8, kernel_size=3, n_steps=30)
        variables = layer.init(rng, x)
        kernel = variables["params"]["kernel"] * 5.0  # inflate
        variables = {
            "params": {**variables["params"], "kernel": kernel},
            "spectral": variables["spectral"],
        }
        _, updated = layer.apply(variables, x, mutable=["spectral"])
        # apply once more with converged u, then check sigma of normalized kernel
        from satflow_tpu.nn.norm import SpectralNorm

        sn = SpectralNorm(n_steps=30)
        k_bar = sn.apply({"spectral": {"u": updated["spectral"]["sn"]["u"]}}, kernel)
        sigma = np.linalg.svd(
            np.asarray(k_bar).reshape(-1, 8), compute_uv=False
        )[0]
        assert abs(sigma - 1.0) < 0.05

    def test_conditional_norm(self, rng):
        x = jax.random.normal(rng, (4, 8, 8, 16))
        cond = jax.random.normal(jax.random.PRNGKey(1), (4, 10))
        layer = snn.ConditionalNorm(features=16)
        variables = layer.init(rng, x, cond)
        y, _ = layer.apply(variables, x, cond, mutable=["batch_stats"])
        assert y.shape == x.shape and _finite(y)


class TestMisc:
    def test_condition_time(self):
        x = jnp.zeros((2, 3, 4, 4, 5))
        y = snn.condition_time(x, fstep=2, horizon=7)
        assert y.shape == (2, 3, 4, 4, 12)
        np.testing.assert_allclose(np.asarray(y[..., 5 + 2]), 1.0)
        assert float(jnp.sum(y[..., 5:])) == 2 * 3 * 4 * 4  # one-hot only

    def test_space_to_depth_roundtrip(self, rng):
        x = jax.random.normal(rng, (2, 6, 8, 8, 3))
        y = snn.space_to_depth(x, 2)
        assert y.shape == (2, 6, 4, 4, 12)
        z = snn.reverse_space_to_depth(y, 2)
        np.testing.assert_allclose(np.asarray(x), np.asarray(z))

    def test_crop_center(self):
        x = jnp.arange(8 * 8, dtype=jnp.float32).reshape(1, 8, 8, 1)
        y = snn.crop_center(x, 4, 4)
        assert y.shape == (1, 4, 4, 1)
        assert float(y[0, 0, 0, 0]) == float(x[0, 2, 2, 0])


class TestLosses:
    def test_registry_losses(self, rng):
        pred = jax.random.uniform(rng, (2, 4, 8, 8, 3))
        target = jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 8, 8, 3))
        for name in ("mse", "l1", "bce", "focal", "huber"):
            fn = snn.get_loss(name)
            val = fn(pred, target)
            assert val.shape == () and _finite(val)

    def test_ssim_identity(self, rng):
        x = jax.random.uniform(rng, (2, 16, 16, 3))
        from satflow_tpu.ops.ssim import ms_ssim, ssim

        assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)
        big = jnp.tile(x, (1, 4, 4, 1))  # 64px: exercises the level clamp
        assert float(ms_ssim(big, big)) == pytest.approx(1.0, abs=1e-4)

    def test_ms_ssim_is_per_sample_then_mean(self, rng):
        """pytorch_msssim order: per-sample weighted geometric product, batch
        mean LAST — so a batch score equals the mean of its samples' scores
        (the pre-fix order averaged the batch before the product and violated
        this for any batch with heterogeneous samples)."""
        from satflow_tpu.ops.ssim import ms_ssim

        k1, k2, k3 = jax.random.split(rng, 3)
        a = jax.random.uniform(k1, (1, 64, 64, 2))
        b = jnp.clip(a + 0.4 * jax.random.normal(k2, a.shape), 0, 1)
        ya = jnp.clip(a + 0.02 * jax.random.normal(k3, a.shape), 0, 1)
        batch_x = jnp.concatenate([a, b], axis=0)
        batch_y = jnp.concatenate([ya, b], axis=0)
        per_sample_mean = 0.5 * (float(ms_ssim(a, ya)) + float(ms_ssim(b, b)))
        assert float(ms_ssim(batch_x, batch_y)) == pytest.approx(
            per_sample_mean, abs=1e-5
        )

    def test_ssim_loss_orders_degradation(self, rng):
        x = jax.random.uniform(rng, (2, 32, 32, 1))
        noisy_small = x + 0.01 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
        noisy_big = x + 0.3 * jax.random.normal(jax.random.PRNGKey(2), x.shape)
        loss = snn.get_loss("ssim")
        assert float(loss(noisy_small, x)) < float(loss(noisy_big, x))

    def test_gan_loss_modes(self, rng):
        pred = jax.random.normal(rng, (4, 5))
        for mode in ("vanilla", "lsgan", "wgangp"):
            gl = snn.GANLoss(mode)
            assert _finite(gl(pred, True)) and _finite(gl(pred, False))

    def test_gradient_penalty(self, rng):
        real = jax.random.normal(rng, (4, 8, 8, 2))
        fake = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, 2))
        gp = snn.gradient_penalty(lambda x: jnp.sum(x * x, axis=(1, 2, 3)), real, fake, rng)
        assert gp.shape == () and _finite(gp) and float(gp) >= 0
