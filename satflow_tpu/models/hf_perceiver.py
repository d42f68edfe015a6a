"""HuggingFace Perceiver fine-tune scaffold (reference satflow/models/perceiverio.py).

The reference wraps ``deepmind/optical-flow-perceiver`` from the HF hub and
adds 1x1 channel-change convs for the sat/HRV heads — but its implementation
is unfinished/broken (no ``super().__init__()``, undefined ``self.mse``,
``Conv2d`` calls missing kernel_size; SURVEY §2.8 defect 7, reference
perceiverio.py:46-91). This rebuild provides the intended capability on the
in-repo JAX Perceiver:

- ``pretrained=True`` fetches the HF torch checkpoint, derives the exact core
  geometry from its config/state_dict (latents, token dim, depth, heads, FF
  widening, q/k/v biases, no decoder query-residual), and maps the FULL
  transformer core onto :class:`MultiPerceiverIO` via
  :func:`satflow_tpu.interop.torch_weights.load_hf_optical_flow`.
- the core decodes the HF head's ``flow_channels`` (2) and a 1x1
  ``channel_change`` conv maps them to ``sat_channels`` — the reference's
  intended fine-tune head, done correctly.
- the HF image preprocessor (project-then-concat Fourier) and the in-repo
  modality projections (concat-then-project) are architecturally different;
  those projections plus the query grid are fine-tuned from init.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
from flax import linen as nn

from satflow_tpu.core.registry import register_model
from satflow_tpu.data import consts
from satflow_tpu.models.perceiver import Perceiver


class _FlowHead(nn.Module):
    """Core predicting ``flow_channels`` + 1x1 conv to the satellite channels."""

    core: nn.Module
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        y = self.core(inputs, train=train)  # (B, T, H, W, flow_channels)
        b, t = y.shape[:2]
        y = y.reshape(b * t, *y.shape[2:])
        y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="channel_change")(y)
        return y.reshape(b, t, *y.shape[1:])


@register_model(name="huggingfaceperceiver")
class HuggingFacePerceiver(Perceiver):
    """``hf_perceiver`` config surface (reference perceiverio.py:46-91)."""

    def __init__(
        self,
        model_name: str = "deepmind/optical-flow-perceiver",
        forecast_steps: int = 24,
        input_channels: int = 12,
        sat_channels: int = 12,
        train_size: int = 64,
        lr: float = 5e-4,
        pretrained: bool = False,
        flow_channels: int = 2,
        **kwargs,
    ):
        self.model_name = model_name
        self.train_size = train_size
        self.flow_channels = flow_channels
        # hparams-rebuild passes every captured Perceiver kwarg back through
        # **kwargs; input_size is owned by train_size here
        kwargs.pop("input_size", None)
        hf_state: Optional[Dict[str, Any]] = None
        if pretrained:
            hf_state, hf_kwargs, self.flow_channels = self._fetch_hf(
                model_name, train_size
            )
            kwargs.update(hf_kwargs)
        else:
            # deepmind/optical-flow-perceiver's 322-dim tokens x 2048 latents
            # are oversized for from-scratch nowcasting; keep a trimmed
            # geometry with the same dense per-pixel decode.
            kwargs.setdefault("depth", 8)
            kwargs.setdefault("num_latents", 512)
            kwargs.setdefault("latent_dim", 512)
            kwargs.setdefault("latent_heads", 8)
            kwargs.setdefault("use_learnable_query", True)
        super().__init__(
            forecast_steps=forecast_steps,
            input_channels=input_channels,
            sat_channels=sat_channels,
            input_size=train_size,
            lr=lr,
            pretrained=pretrained,
            **kwargs,
        )
        if hf_state is not None:
            self._load_hf_weights(hf_state)
            # the mapped weights live in restored_variables (and, later, in
            # checkpoints); rebuilding from hparams must not re-hit the hub
            self.pretrained = False

    def build_module(self) -> nn.Module:
        core = super().build_module().clone(output_channels=self.flow_channels)
        return _FlowHead(core=core, out_channels=self.output_channels,
                         dtype=self.dtype)

    @staticmethod
    def _fetch_hf(model_name: str, train_size: int):
        """Download the HF model; return (state_dict, derived kwargs, flow_ch).

        Geometry is read from the checkpoint itself (shapes beat config
        defaults): latent count/dim from ``embeddings.latents``, the 322-dim
        token width from the encoder's context LayerNorm, FF widening from the
        MLP shapes, head dims from the q/k/v projections.
        """
        try:
            from transformers import PerceiverForOpticalFlow
        except ImportError as e:  # pragma: no cover - transformers is baked in
            raise ImportError(
                "pretrained=True requires the transformers package"
            ) from e
        from satflow_tpu.interop.torch_weights import _np, strip_hf_prefix

        hf = PerceiverForOpticalFlow.from_pretrained(
            model_name,
            ignore_mismatched_sizes=True,
            train_size=[train_size, train_size],
        )
        cfg = hf.config
        if getattr(cfg, "num_blocks", 1) != 1:
            raise ValueError(
                f"num_blocks={cfg.num_blocks}: weight-shared block repetition "
                "is not mapped (deepmind/optical-flow-perceiver uses 1)"
            )
        sd = {k: _np(v) for k, v in strip_hf_prefix(hf.state_dict()).items()}
        num_latents, latent_dim = sd["embeddings.latents"].shape
        token_dim = sd[
            "encoder.cross_attention.attention.self.layernorm2.weight"
        ].shape[0]
        latent_heads = int(cfg.num_self_attention_heads)
        cross_heads = int(cfg.num_cross_attention_heads)
        qk_self = sd["encoder.self_attends.0.attention.self.query.weight"].shape[0]
        v_self = sd["encoder.self_attends.0.attention.self.value.weight"].shape[0]
        qk_cross = sd["encoder.cross_attention.attention.self.query.weight"].shape[0]
        v_cross = sd["encoder.cross_attention.attention.self.value.weight"].shape[0]
        if qk_self != v_self or qk_cross != v_cross:
            raise ValueError(
                f"qk_channels != v_channels ({qk_self}/{v_self} self, "
                f"{qk_cross}/{v_cross} cross) is not mapped"
            )
        if qk_self % latent_heads or qk_cross % cross_heads:
            raise ValueError("attention channels not divisible by head count")
        latent_ff = sd["encoder.self_attends.0.mlp.dense1.weight"].shape[0]
        cross_ff = sd["encoder.cross_attention.mlp.dense1.weight"].shape[0]
        dec_ff = sd[
            "decoder.decoder.decoding_cross_attention.mlp.dense1.weight"
        ].shape[0]
        if latent_ff % latent_dim or cross_ff % latent_dim or dec_ff % token_dim:
            raise ValueError("non-integer FF widening factor is not mapped")
        if dec_ff // token_dim != cross_ff // latent_dim:
            raise ValueError(
                "decoder vs encoder cross-attention widening factors differ"
            )
        flow_channels = sd["decoder.decoder.final_layer.weight"].shape[0]
        kwargs = dict(
            depth=int(cfg.num_self_attends_per_block),
            num_latents=int(num_latents),
            latent_dim=int(latent_dim),
            latent_heads=latent_heads,
            cross_heads=cross_heads,
            latent_dim_heads=int(qk_self) // latent_heads,
            cross_dim_heads=int(qk_cross) // cross_heads,
            dim=int(token_dim),
            queries_dim=int(token_dim),
            qkv_bias=True,
            latent_ff_mult=int(latent_ff) // int(latent_dim),
            cross_ff_mult=int(cross_ff) // int(latent_dim),
            decoder_query_residual=False,  # PerceiverOpticalFlowDecoder setting
            use_learnable_query=True,
        )
        return sd, kwargs, int(flow_channels)

    def _load_hf_weights(self, state_dict: Dict[str, Any]) -> None:
        """Map the HF transformer core into freshly-initialized variables."""
        import jax

        from satflow_tpu.interop.torch_weights import (
            _to_mutable,
            load_hf_optical_flow,
        )

        s = self.input_size
        x = np.zeros(
            (1, self.history_steps, s, s, self.sat_channels), np.float32
        )
        inputs, _ = self.prepare_batch(({consts.SATELLITE_DATA: x}, x))
        variables = self.module.init(jax.random.PRNGKey(0), inputs)
        params = _to_mutable(dict(variables))["params"]
        prefix = (
            "core/perceiver"
            if self.predict_timesteps_together
            else "core/steps/core"
        )
        params = load_hf_optical_flow(
            params, self.module.core, state_dict, flax_prefix=prefix,
            strict=True,
        )
        self.restored_variables = {"params": params}
