"""Perceiver IO multimodal forecaster (reference satflow/models/perceiver.py:34-399).

Fuses satellite video + NWP video + topographic image + 1D coordinate series +
datetime features through a multimodal Perceiver IO (in-repo,
satflow_tpu/nn/perceiver.py) with a learnable decoder query.

Capability parity:
- modality construction incl. optional NWP/datetime modalities and the
  ``forecast_time`` one-hot series when predicting per-step (perceiver.py:145-236),
- ``LearnableQuery`` with optional temporally-consistent Fourier features
  (perceiver.py:91-104, 363-396),
- ImageEncoder/ImageDecoder pre/post-processors incl. "metnet" prep
  (perceiver.py:113-143, 258-265),
- per-timestep autoregressive query loop (perceiver.py:319-325) — here a
  ``lax.scan`` over lead times inside one jit (weights hoisted, no per-step
  dispatch) — or all-timesteps-at-once decoding,
- LAMB optimizer + warmup cosine (perceiver.py:343-347).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from satflow_tpu.core.registry import register_model
from satflow_tpu.data import consts
from satflow_tpu.models.base import BaseModel
from satflow_tpu.nn.perceiver import (
    ImageDecoder,
    ImageEncoder,
    InputModality,
    LearnableQuery,
    MultiPerceiverIO,
    encode_position,
)
from satflow_tpu.train.schedules import warmup_cosine


class _PerLeadStep(nn.Module):
    """One per-lead-time decode: swap the forecast_time modality, run the core."""

    core_kwargs: Dict[str, Any]

    @nn.compact
    def __call__(self, carry, fstep_onehot):
        inputs, queries = carry
        x = dict(inputs)
        x["forecast_time"] = fstep_onehot
        out = MultiPerceiverIO(**self.core_kwargs, name="core")(x, queries)
        return carry, out


class PerceiverSatFlowCore(nn.Module):
    """(dict of modality arrays) → (B, forecast_steps, H, W, C_out)."""

    modalities: Tuple[InputModality, ...]
    forecast_steps: int
    input_size: int
    output_channels: int
    queries_dim: int = 32
    dim: int = 32
    depth: int = 6
    num_latents: int = 256
    latent_dim: int = 512
    cross_heads: int = 1
    latent_heads: int = 8
    cross_dim_heads: int = 8
    latent_dim_heads: int = 64
    weight_tie_layers: bool = False
    decoder_ff: bool = True
    qkv_bias: bool = False
    cross_ff_mult: int = 2
    latent_ff_mult: int = 2
    decoder_query_residual: bool = True
    max_frequency: float = 4.0
    sin_only: bool = False
    predict_timesteps_together: bool = False
    use_learnable_query: bool = True
    generate_fourier_features: bool = True
    temporally_consistent_fourier_features: bool = False
    preprocessor_type: Optional[str] = None
    postprocessor_type: Optional[str] = None
    # Rematerialize each per-lead decode in the backward pass. Without it the
    # stepped path saves every lead step's cross/self-attention activations
    # (O(F · tokens · dim) HBM temps — at 64px F48 b8 that is ~20 GB and the
    # train step refuses to compile on a 16 GB chip); with it the backward
    # recomputes one lead step at a time, the same memory/FLOPs trade the
    # recurrent family's per-step remat makes.
    remat_steps: bool = True
    dtype: Any = None

    def _core_kwargs(self) -> Dict[str, Any]:
        return dict(
            modalities=self.modalities,
            dim=self.dim,
            queries_dim=self.queries_dim,
            logits_dim=self.output_channels,
            depth=self.depth,
            num_latents=self.num_latents,
            latent_dim=self.latent_dim,
            cross_heads=self.cross_heads,
            latent_heads=self.latent_heads,
            cross_dim_head=self.cross_dim_heads,
            latent_dim_head=self.latent_dim_heads,
            weight_tie_layers=self.weight_tie_layers,
            decoder_ff=self.decoder_ff,
            qkv_bias=self.qkv_bias,
            cross_ff_mult=self.cross_ff_mult,
            latent_ff_mult=self.latent_ff_mult,
            decoder_query_residual=self.decoder_query_residual,
            dtype=self.dtype,
        )

    @nn.compact
    def __call__(self, inputs: Dict[str, jax.Array], train: bool = False) -> jax.Array:
        inputs = dict(inputs)
        b = inputs[consts.SATELLITE_DATA].shape[0]
        size = self.input_size

        if self.preprocessor_type is not None:
            pre = ImageEncoder(prep_type=self.preprocessor_type, dtype=self.dtype,
                               name="preprocessor")
            inputs[consts.SATELLITE_DATA] = pre(inputs[consts.SATELLITE_DATA])
            if consts.TOPOGRAPHIC_DATA in inputs:
                inputs[consts.TOPOGRAPHIC_DATA] = pre(inputs[consts.TOPOGRAPHIC_DATA])
            if consts.NWP_DATA in inputs:
                inputs[consts.NWP_DATA] = pre(inputs[consts.NWP_DATA])

        # decoder queries
        query_shape = (
            (self.forecast_steps, size, size)
            if self.predict_timesteps_together
            else (size, size)
        )
        if self.use_learnable_query:
            fourier = None
            if self.temporally_consistent_fourier_features and self.predict_timesteps_together:
                t_hist = inputs[consts.SATELLITE_DATA].shape[1]
                total_t = t_hist + self.forecast_steps
                ff = encode_position(
                    b, (total_t, size, size),
                    num_frequency_bands=max(size, total_t),
                    max_frequency=self.max_frequency,
                    sine_only=self.sin_only,
                )
                ff = ff.reshape(b, total_t, size, size, -1)[:, t_hist:]
                fourier = ff
            queries = LearnableQuery(
                channel_dim=self.queries_dim,
                query_shape=query_shape,
                max_frequency=self.max_frequency,
                num_frequency_bands=size,
                sine_only=self.sin_only,
                generate_fourier_features=self.generate_fourier_features,
                dtype=self.dtype,
                name="query",
            )(b, fourier)
        else:
            sat = inputs[consts.SATELLITE_DATA]
            queries = sat.reshape(b, -1, sat.shape[-1])[:, : int(np.prod(query_shape))]
            queries = nn.Dense(self.queries_dim, dtype=self.dtype,
                               name="query_from_sat")(queries)

        if self.predict_timesteps_together:
            out = MultiPerceiverIO(**self._core_kwargs(), name="perceiver")(
                inputs, queries
            )
            out = out.reshape(b, self.forecast_steps, size, size, self.output_channels)
        else:
            one_hots = jnp.broadcast_to(
                jnp.eye(self.forecast_steps, dtype=queries.dtype)[:, None, :, None],
                (self.forecast_steps, b, self.forecast_steps, 1),
            )
            step_cls = (
                nn.remat(_PerLeadStep, prevent_cse=False)
                if self.remat_steps
                else _PerLeadStep
            )
            scanned = nn.scan(
                step_cls,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
            )(self._core_kwargs(), name="steps")
            _, outs = scanned((inputs, queries), one_hots)
            out = outs.reshape(
                self.forecast_steps, b, size, size, self.output_channels
            )
            out = jnp.swapaxes(out, 0, 1)

        if self.postprocessor_type is not None:
            out = ImageDecoder(
                postprocess_type=self.postprocessor_type,
                output_channels=self.output_channels,
                dtype=self.dtype,
                name="postprocessor",
            )(out)
        return out


@register_model
class Perceiver(BaseModel):
    """Registered task model (reference perceiver.py:34)."""

    def __init__(
        self,
        input_channels: int = 22,
        sat_channels: int = 12,
        nwp_channels: int = 10,
        base_channels: int = 1,
        forecast_steps: int = 48,
        history_steps: int = 6,
        input_size: int = 64,
        lr: float = 5e-4,
        visualize: bool = False,
        max_frequency: float = 4.0,
        depth: int = 6,
        num_latents: int = 256,
        cross_heads: int = 1,
        latent_heads: int = 8,
        cross_dim_heads: int = 8,
        latent_dim: int = 512,
        weight_tie_layers: bool = False,
        decoder_ff: bool = True,
        dim: int = 32,
        logits_dim: Optional[int] = None,
        queries_dim: int = 32,
        latent_dim_heads: int = 64,
        loss: str = "mse",
        sin_only: bool = False,
        encode_fourier: bool = True,
        preprocessor_type: Optional[str] = None,
        postprocessor_type: Optional[str] = None,
        encoder_kwargs: Optional[Dict[str, Any]] = None,
        decoder_kwargs: Optional[Dict[str, Any]] = None,
        pretrained: bool = False,
        predict_timesteps_together: bool = False,
        nwp_modality: bool = False,
        datetime_modality: bool = False,
        use_learnable_query: bool = True,
        generate_fourier_features: bool = True,
        temporally_consistent_fourier_features: bool = False,
        num_freq_bands: Optional[int] = None,
        warmup_steps: int = 1000,
        total_steps: int = 100_000,
        qkv_bias: bool = False,
        cross_ff_mult: int = 2,
        latent_ff_mult: int = 2,
        decoder_query_residual: bool = True,
        remat_steps: bool = True,
        dtype: Any = None,
    ):
        self.sat_channels = sat_channels
        self.nwp_channels = nwp_channels
        self.base_channels = base_channels
        self.history_steps = history_steps
        self.input_size = input_size
        self.max_frequency = max_frequency
        self.depth = depth
        self.num_latents = num_latents
        self.cross_heads = cross_heads
        self.latent_heads = latent_heads
        self.cross_dim_heads = cross_dim_heads
        self.latent_dim = latent_dim
        self.weight_tie_layers = weight_tie_layers
        self.decoder_ff = decoder_ff
        self.dim = dim
        # The decode reshapes logits to (..., output_channels), so the final
        # projection width is DERIVED (the reference configs all set
        # logits_dim: null and let the wrapper derive it the same way,
        # reference configs/model/perceiver.yaml:18). Reject a conflicting
        # explicit value instead of silently ignoring it.
        if logits_dim is not None and logits_dim != sat_channels:
            raise ValueError(
                f"logits_dim={logits_dim} conflicts with the derived output "
                f"width ({sat_channels} = sat_channels = output channels); "
                "leave it null/None (the reference configs do) or match it"
            )
        self.logits_dim = logits_dim
        self.queries_dim = queries_dim
        self.latent_dim_heads = latent_dim_heads
        self.sin_only = sin_only
        self.encode_fourier = encode_fourier
        self.preprocessor_type = preprocessor_type
        self.postprocessor_type = postprocessor_type
        self.predict_timesteps_together = predict_timesteps_together
        self.nwp_modality = nwp_modality
        self.datetime_modality = datetime_modality
        self.use_learnable_query = use_learnable_query
        self.generate_fourier_features = generate_fourier_features
        self.temporally_consistent_fourier_features = temporally_consistent_fourier_features
        # Nyquist warning from the reference (perceiver.py:107-112) applies; a
        # smaller band count keeps token dims manageable on small test inputs.
        self.num_freq_bands = num_freq_bands if num_freq_bands is not None else input_size
        self.warmup_steps = warmup_steps
        self.total_steps = total_steps
        self.qkv_bias = qkv_bias
        self.cross_ff_mult = cross_ff_mult
        self.latent_ff_mult = latent_ff_mult
        self.decoder_query_residual = decoder_query_residual
        self.remat_steps = remat_steps
        self.dtype = dtype
        super().__init__(
            forecast_steps=forecast_steps,
            lr=lr,
            loss=loss,
            visualize=visualize,
            input_channels=input_channels,
            output_channels=sat_channels,
            pretrained=pretrained,
        )

    def _build_modalities(self) -> Tuple[InputModality, ...]:
        nf = self.num_freq_bands
        mods = [
            InputModality(consts.SATELLITE_DATA, self.sat_channels, 3, nf,
                          self.max_frequency, self.sin_only, self.encode_fourier),
        ]
        if self.nwp_modality:
            mods.append(
                InputModality(consts.NWP_DATA, self.nwp_channels, 3, nf,
                              self.max_frequency, self.sin_only, self.encode_fourier)
            )
        mods.append(
            InputModality(consts.TOPOGRAPHIC_DATA, self.base_channels, 2, nf,
                          self.max_frequency, self.sin_only, self.encode_fourier)
        )
        if not self.predict_timesteps_together:
            mods.append(
                InputModality("forecast_time", 1, 1, self.forecast_steps,
                              self.max_frequency, self.sin_only, self.encode_fourier)
            )
        coord_names = [consts.SATELLITE_Y_COORDS, consts.SATELLITE_X_COORDS,
                       consts.TOPOGRAPHIC_Y_COORDS, consts.TOPOGRAPHIC_X_COORDS]
        if self.nwp_modality:
            coord_names += [consts.NWP_Y_COORDS, consts.NWP_X_COORDS]
        for name in coord_names:
            mods.append(
                InputModality(name, 1, 1, nf, self.max_frequency,
                              self.sin_only, self.encode_fourier)
            )
        if self.datetime_modality:
            for name in (consts.SATELLITE_DATETIME_INDEX,) + consts.DATETIME_FEATURE_NAMES:
                mods.append(
                    InputModality(name, 1, 1, 2 * self.history_steps + 1,
                                  self.max_frequency, self.sin_only,
                                  self.encode_fourier)
                )
        return tuple(mods)

    def build_module(self) -> nn.Module:
        return PerceiverSatFlowCore(
            modalities=self._build_modalities(),
            forecast_steps=self.forecast_steps,
            input_size=self.input_size,
            output_channels=self.output_channels,
            queries_dim=self.queries_dim,
            dim=self.dim,
            depth=self.depth,
            num_latents=self.num_latents,
            latent_dim=self.latent_dim,
            cross_heads=self.cross_heads,
            latent_heads=self.latent_heads,
            cross_dim_heads=self.cross_dim_heads,
            latent_dim_heads=self.latent_dim_heads,
            weight_tie_layers=self.weight_tie_layers,
            decoder_ff=self.decoder_ff,
            qkv_bias=self.qkv_bias,
            cross_ff_mult=self.cross_ff_mult,
            latent_ff_mult=self.latent_ff_mult,
            decoder_query_residual=self.decoder_query_residual,
            max_frequency=self.max_frequency,
            sin_only=self.sin_only,
            predict_timesteps_together=self.predict_timesteps_together,
            use_learnable_query=self.use_learnable_query,
            generate_fourier_features=self.generate_fourier_features,
            temporally_consistent_fourier_features=self.temporally_consistent_fourier_features,
            preprocessor_type=self.preprocessor_type,
            postprocessor_type=self.postprocessor_type,
            remat_steps=self.remat_steps,
            dtype=self.dtype,
        )

    def prepare_batch(self, batch):
        x, y = batch
        inputs: Dict[str, jax.Array] = {}
        if isinstance(x, dict):
            inputs[consts.SATELLITE_DATA] = jnp.asarray(x[consts.SATELLITE_DATA])
            topo = x.get(consts.TOPOGRAPHIC_DATA)
            if topo is not None:
                topo = jnp.asarray(topo)
                if topo.ndim == 3:
                    topo = topo[..., None]
                inputs[consts.TOPOGRAPHIC_DATA] = topo
            else:
                sat = inputs[consts.SATELLITE_DATA]
                inputs[consts.TOPOGRAPHIC_DATA] = jnp.zeros(
                    (sat.shape[0], sat.shape[2], sat.shape[3], self.base_channels),
                    sat.dtype,
                )
            if self.nwp_modality and consts.NWP_DATA in x:
                nwp = jnp.asarray(x[consts.NWP_DATA])  # (B, C, T, h, w)
                inputs[consts.NWP_DATA] = jnp.moveaxis(nwp, 1, -1)
            for name in (consts.SATELLITE_Y_COORDS, consts.SATELLITE_X_COORDS):
                if name in x:
                    inputs[name] = jnp.asarray(x[name])
            for name in (consts.TOPOGRAPHIC_Y_COORDS, consts.TOPOGRAPHIC_X_COORDS):
                if name in x:
                    inputs[name] = jnp.asarray(x[name])
                else:
                    b = inputs[consts.SATELLITE_DATA].shape[0]
                    inputs[name] = jnp.zeros(
                        (b, inputs[consts.TOPOGRAPHIC_DATA].shape[1]), jnp.float32
                    )
            if self.nwp_modality:
                for name in (consts.NWP_Y_COORDS, consts.NWP_X_COORDS):
                    if name in x:
                        inputs[name] = jnp.asarray(x[name])
            if self.datetime_modality:
                for name in (consts.SATELLITE_DATETIME_INDEX,) + consts.DATETIME_FEATURE_NAMES:
                    if name in x:
                        inputs[name] = jnp.asarray(x[name])
        else:
            inputs[consts.SATELLITE_DATA] = jnp.asarray(x)
        if isinstance(y, dict):
            y = jnp.asarray(y[consts.SATELLITE_DATA])
        y = y[..., : self.output_channels]
        return inputs, y

    @property
    def lr_schedule(self):
        return warmup_cosine(self.lr, self.warmup_steps, self.total_steps)

    def make_optimizer(self) -> optax.GradientTransformation:
        # LAMB, as in the reference (perceiver.py:343)
        return optax.lamb(self.lr_schedule, b1=0.9, b2=0.999)
