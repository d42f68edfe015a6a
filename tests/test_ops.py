"""Ops tests: optical flow, warping, baseline harness, transforms, ZeRO sharding."""

import datetime

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from satflow_tpu.data import transforms
from satflow_tpu.data.fake import AdvectionDataset
from satflow_tpu.ops.flow import horn_schunck_flow, rollout_warp, warp_flow


class TestWarp:
    def test_identity_flow(self, rng):
        img = jax.random.uniform(rng, (8, 8))
        out = warp_flow(img, jnp.zeros((8, 8, 2)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_integer_shift(self):
        img = jnp.arange(64.0).reshape(8, 8)
        flow = jnp.ones((8, 8, 2))  # sample from (y+1, x+1)
        out = warp_flow(img, flow)
        # interior: out[y, x] = img[y+1, x+1]
        np.testing.assert_allclose(
            np.asarray(out[:-1, :-1]), np.asarray(img[1:, 1:]), atol=1e-5
        )

    def test_rollout_warp_steps(self, rng):
        img = jax.random.uniform(rng, (8, 8))
        frames = rollout_warp(img, jnp.zeros((8, 8, 2)), 5)
        assert frames.shape == (5, 8, 8)
        np.testing.assert_allclose(np.asarray(frames[4]), np.asarray(img), atol=1e-5)


class TestFlowBaseline:
    def test_flow_beats_persistence_on_advection(self):
        """On translating blobs, flow extrapolation must beat persistence —
        the qualitative relationship of the published numbers (README.md:13-14)."""
        from satflow_tpu.baseline.optical_flow import run_baseline

        ds = AdvectionDataset(batch_size=2, width=32, height=32,
                              number_sat_channels=1, history_minutes=15,
                              forecast_minutes=20, velocity=(0, 2), length=1)
        res = run_baseline(ds, forecast_steps=4, flow_method="farneback",
                          max_batches=1)
        assert res["flow_loss"].shape == (1, 4)
        assert res["flow_mean"] < res["baseline_mean"]

    def test_horn_schunck_extrapolation_convention(self):
        """HS flow returns −motion: warping the latest frame by it must
        reproduce the NEXT frame of a constant translation."""
        rng = np.random.default_rng(0)
        base = rng.random((32, 32)).astype(np.float32)
        from scipy.ndimage import gaussian_filter

        base = gaussian_filter(base, 2.0)
        shifted = np.roll(base, 1, axis=1)  # moved +1 in x
        flow = np.asarray(horn_schunck_flow(jnp.asarray(base), jnp.asarray(shifted)))
        interior = flow[8:-8, 8:-8]
        assert interior[..., 0].mean() < -0.5  # −motion for a +x translation
        assert abs(interior[..., 1].mean()) < 0.1
        # forward warp of the latest frame approximates the next frame
        nxt = np.asarray(warp_flow(jnp.asarray(shifted), jnp.asarray(flow)))
        truth = np.roll(base, 2, axis=1)
        err = np.abs(nxt[8:-8, 8:-8] - truth[8:-8, 8:-8]).mean()
        persist = np.abs(shifted[8:-8, 8:-8] - truth[8:-8, 8:-8]).mean()
        assert err < persist * 0.5


class TestTransforms:
    def test_eumetsat_datetime(self):
        dt = transforms.eumetsat_name_to_datetime(
            "MSG3-SEVI-MSG15-0100-NA-202103041200.nat"
        )
        assert dt == datetime.datetime(2021, 3, 4, 12, 0)

    def test_binarize_mask(self):
        m = transforms.binarize_mask(np.asarray([[0.2, 0.7]]))
        np.testing.assert_array_equal(m, [[0.0, 1.0]])

    def test_pixel_coord_layers(self):
        layers = transforms.create_pixel_coord_layers(4, 4, with_r=True)
        assert layers.shape == (4, 4, 3)
        assert layers[0, 0, 0] == -1.0 and layers[-1, -1, 1] == 1.0

    def test_check_channels(self):
        n = transforms.check_channels(
            sat_channels=["a"] * 12, nwp_channels=["b"] * 10,
            use_topo=True, use_latlon=True, use_time=True, use_mask=True,
        )
        assert n == 12 + 10 + 1 + 2 + 4 + 1

    def test_standardizer_roundtrip(self):
        x = np.random.default_rng(0).random((4, 4, 3)).astype(np.float32)
        st = transforms.Standardizer(x.mean((0, 1)), x.std((0, 1)))
        np.testing.assert_allclose(st.inverse(st(x)), x, atol=1e-5)


class TestZero:
    def test_opt_state_sharded(self, mesh, rng):
        import optax

        from satflow_tpu.parallel.zero import apply_zero_sharding, leaf_sharding
        from satflow_tpu.train.state import TrainState

        params = {"w": jnp.zeros((16, 4)), "b": jnp.zeros((3,))}
        state = TrainState.create(params, {}, optax.adam(1e-3))
        state = apply_zero_sharding(state, mesh)
        mu = state.opt_state[0].mu["w"]
        assert mu.sharding.spec[0] == "data"  # dim-16 axis split over 8 devices
        b_mu = state.opt_state[0].mu["b"]
        assert b_mu.sharding.spec == ()  # 3 not divisible → replicated
