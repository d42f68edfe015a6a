"""BaseModel: the task wrapper every zoo model derives from.

The TPU-native analog of the reference's LightningModule + external
``nowcasting_utils.models.base.BaseModel`` (used at reference
satflow/models/__init__.py:1): it owns a pure flax module, a loss, and an optax
optimizer spec, and exposes *pure functions* the training engine jits:

- ``init_variables(rng, batch)``   — parameter/state initialization
- ``loss(params, state, batch, rng, train)`` → (loss, (metrics, new_state))
- ``make_optimizer()``             — optax chain from the model's hparams

Design difference from torch Lightning: there is no mutable ``self`` during the
step. All mutable collections (batch_stats, spectral-norm u vectors) thread through
``state`` explicitly so the whole train step stays one compiled XLA program.

Metric conventions match the reference: ``{split}/loss`` plus per-lead-time
``{split}/frame_{f}_loss`` (reference satflow/models/conv_lstm.py:64-69) — computed
here as a single vectorized (T,) reduction instead of T separate criterion calls.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from satflow_tpu.nn.losses import get_loss

Batch = Any
Variables = Dict[str, Any]

# Collections that are model state (not optimized), threaded through the step.
STATE_COLLECTIONS = ("batch_stats", "spectral")


class BaseModel:
    """Task wrapper: flax module + loss + optimizer + batch preparation."""

    #: set True in GAN subclasses; the engine then uses the two-optimizer step.
    is_gan: bool = False

    def __init__(
        self,
        forecast_steps: int = 48,
        lr: float = 1e-3,
        loss: str = "mse",
        visualize: bool = False,
        input_channels: int = 12,
        output_channels: int = 12,
        pretrained: bool = False,
    ):
        self.forecast_steps = forecast_steps
        self.lr = lr
        self.visualize = visualize
        self.input_channels = input_channels
        self.output_channels = output_channels
        self.pretrained = pretrained
        self.criterion = get_loss(loss) if isinstance(loss, str) else loss
        self.loss_name = loss if isinstance(loss, str) else getattr(loss, "__name__", "custom")
        self.module = self.build_module()

    # -- to be provided by subclasses ---------------------------------------

    def build_module(self):
        raise NotImplementedError

    def prepare_batch(self, batch: Batch) -> Tuple[jax.Array, jax.Array]:
        """Map the datamodule's (x_dict, y_dict) to model (x, y) tensors.

        Default: take the satellite video for both (the ConvLSTM/U-Net family
        behavior); multimodal models override (MetNet's _combine_data_sources,
        Perceiver's modality dict).
        """
        x, y = batch
        if isinstance(x, dict):
            x = x["sat_data"]
        if isinstance(y, dict):
            y = y["sat_data"]
        return x, y

    def eval_batch(self, batch: Batch) -> Tuple[jax.Array, jax.Array]:
        """(x, y) for metric evaluation: y must be time-major (B, T, H, W, C).

        Defaults to ``prepare_batch``; models whose training target is
        channels-stacked (Pix2Pix) override to keep the evaluator's
        per-lead-time curves meaningful.
        """
        return self.prepare_batch(batch)

    def forward(
        self,
        variables: Variables,
        x: jax.Array,
        rng: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        """Inference forward. Subclasses may override for extra args."""
        return self.module.apply(variables, x, train=train, rngs=_rngs(rng))

    # -- engine interface ----------------------------------------------------

    def init_variables(self, rng: jax.Array, batch: Batch) -> Variables:
        x, _ = self.prepare_batch(batch)
        return self.module.init(rng, x)

    def split_variables(self, variables: Variables) -> Tuple[Any, Dict[str, Any]]:
        """Split into (params, state-collections)."""
        variables = dict(variables)
        params = variables.pop("params")
        state = {k: v for k, v in variables.items() if k in STATE_COLLECTIONS}
        return params, state

    def loss(
        self,
        params: Any,
        state: Dict[str, Any],
        batch: Batch,
        rng: jax.Array,
        train: bool = True,
    ) -> Tuple[jax.Array, Tuple[Dict[str, jax.Array], Dict[str, Any]]]:
        x, y = self.prepare_batch(batch)
        variables = {"params": params, **state}
        mutable = [k for k in state] if train else False
        out = self.module.apply(
            variables, x, train=train, rngs=_rngs(rng), mutable=mutable
        )
        y_hat, new_state = out if train else (out, state)
        loss = self.criterion(y_hat, y)
        metrics = {"loss": loss, **self.frame_metrics(y_hat, y)}
        return loss, (metrics, new_state if train else state)

    def frame_metrics(self, y_hat: jax.Array, y: jax.Array) -> Dict[str, jax.Array]:
        """Per-lead-time loss vector (reference's frame_{f}_loss convention).

        Uses the *configured* criterion per frame — the reference logs
        ``self.criterion(y_hat[:, f], y[:, f])`` (reference
        satflow/models/conv_lstm.py:64-69), so an SSIM-trained model gets SSIM
        frame curves, not MSE. Vectorized as one vmap over the lead-time axis
        instead of T separate criterion calls.
        """
        if y_hat.ndim >= 5 and y_hat.shape[1] == y.shape[1]:
            try:
                per_frame = jax.vmap(self.criterion, in_axes=(1, 1))(y_hat, y)
            except Exception:  # criterion not per-frame-able: fall back to MSE
                per_frame = jnp.mean(
                    jnp.square(y_hat - y), axis=tuple(range(2, y.ndim))
                ).mean(axis=0)
            return {"frame_loss": per_frame}
        return {}

    def make_optimizer(self) -> optax.GradientTransformation:
        """Adam at ``self.lr`` (reference conv_lstm.py:49-51 default).

        The learning rate is injected as a traced hyperparameter rather than a
        baked constant: hyperparameter sweeps then reuse one compiled train
        step across trials (a per-trial recompile costs minutes on slow
        hosts), and the plateau scheduler can rewrite it in the opt state.
        """
        return optax.inject_hyperparams(optax.adam)(learning_rate=self.lr)

    # -- config parity -------------------------------------------------------

    @classmethod
    def from_config(cls, config: Dict[str, Any]):
        return cls(**config)

    def hparams(self) -> Dict[str, Any]:
        """Serializable hyperparameters (the reference's save_hyperparameters).

        Reflects over the subclass ``__init__`` signature and reads back the
        matching attributes, so checkpoints rebuild the exact architecture
        (reference models call ``save_hyperparameters()``, e.g. conv_lstm.py:33).
        """
        import inspect

        attr_aliases = {"out_channels": "output_channels", "loss": "loss_name",
                        "lr": "lr", "gen_lr": "gen_lr"}
        hp: Dict[str, Any] = {"class": type(self).__name__}
        # Walk the MRO below BaseModel so parameters a subclass forwards
        # through **kwargs (e.g. HuggingFacePerceiver -> Perceiver geometry)
        # are captured too; the most-derived signature wins on collisions.
        # BaseModel itself is excluded: its generic names (out_channels, ...)
        # are re-declared by every concrete signature that accepts them.
        seen = set()
        for klass in type(self).__mro__:
            if klass is BaseModel:
                break
            if "__init__" not in vars(klass):
                continue
            for name, p in inspect.signature(klass.__init__).parameters.items():
                if name in seen or p.kind in (p.VAR_KEYWORD, p.VAR_POSITIONAL):
                    continue
                seen.add(name)
                if name in ("self", "dtype", "encoder_kwargs", "decoder_kwargs"):
                    continue
                attr = attr_aliases.get(name, name)
                if hasattr(self, attr):
                    value = getattr(self, attr)
                    if callable(value) and not isinstance(value, str):
                        continue
                    if _jsonable(value):
                        hp[name] = value
        return hp


def _jsonable(value) -> bool:
    import json

    try:
        json.dumps(value)
        return True
    except (TypeError, ValueError):
        return False


def _rngs(rng: Optional[jax.Array]) -> Optional[Dict[str, jax.Array]]:
    if rng is None:
        return None
    d1, d2 = jax.random.split(rng)
    return {"dropout": d1, "sample": d2}


def expand_frame_metrics(metrics: Dict[str, Any], split: str) -> Dict[str, float]:
    """Flatten a metrics pytree into the reference's logging key convention.

    ``frame_loss`` vectors become ``{split}/frame_{f}_loss`` (conv_lstm.py:64-69);
    GAN-prefixed vectors (``g_frame_loss``) become ``{split}/g_frame_{f}_loss``.
    """
    out: Dict[str, float] = {}
    for k, v in metrics.items():
        v = jax.device_get(v)
        if k.endswith("frame_loss") and jnp.ndim(v) == 1:
            prefix = k[: -len("frame_loss")]
            for f, val in enumerate(v):
                out[f"{split}/{prefix}frame_{f}_loss"] = float(val)
        elif jnp.ndim(v) == 0:
            out[f"{split}/{k}"] = float(v)
    return out
