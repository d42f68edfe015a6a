"""Model registry: ``register_model`` / ``create_model`` / ``get_model`` / ``list_models``.

API parity with the external ``nowcasting_utils.models.base`` registry the reference
uses (imported at reference satflow/models/__init__.py:1 and exercised by
reference tests/test_models.py:64-76). Models register themselves with the
``@register_model`` decorator; ``create_model(name, **kwargs)`` instantiates by
registry name, and names prefixed with ``"local:"`` load from a checkpoint directory
(the TPU-native analog of the reference's ``"hf_hub:"`` prefix, which pulled torch
weights from the HuggingFace hub).
"""

from __future__ import annotations

import fnmatch
from typing import Any, Callable, Dict, List, Optional, Type

_MODEL_REGISTRY: Dict[str, Type] = {}


def _model_entrypoint(name: str) -> Type:
    if name not in _MODEL_REGISTRY:
        raise KeyError(
            f"Unknown model {name!r}. Registered models: {sorted(_MODEL_REGISTRY)}"
        )
    return _MODEL_REGISTRY[name]


def register_model(cls: Optional[Type] = None, *, name: Optional[str] = None):
    """Class decorator adding a model class to the global registry.

    The registry key is the lowercase class name (matching the reference's
    convention, where ``list_models()`` returns lowercase names), unless an
    explicit ``name=`` is given.
    """

    def _register(cls: Type) -> Type:
        key = name or cls.__name__.lower()
        if key in _MODEL_REGISTRY and _MODEL_REGISTRY[key] is not cls:
            raise ValueError(f"Model name {key!r} already registered")
        _MODEL_REGISTRY[key] = cls
        return cls

    if cls is None:
        return _register
    return _register(cls)


def is_model(name: str) -> bool:
    """Whether ``name`` is a registered model name."""
    return name.lower() in _MODEL_REGISTRY


def list_models(filter: str = "") -> List[str]:
    """Sorted registered model names, optionally fnmatch-filtered."""
    names = sorted(_MODEL_REGISTRY)
    if filter:
        names = [n for n in names if fnmatch.fnmatch(n, filter)]
    return names


def get_model(name: str) -> Type:
    """Return the model *class* for a registry name."""
    return _model_entrypoint(name.lower())


def split_model_name(name: str):
    """Split ``source:name`` prefixes (e.g. ``local:/path/to/ckpt``)."""
    if ":" in name:
        source, rest = name.split(":", 1)
        return source, rest
    return "", name


def create_model(name: str, pretrained: bool = False, checkpoint_path: str = "", **kwargs):
    """Instantiate a model by registry name.

    ``local:<dir>`` loads a model (config + params) from an Orbax checkpoint
    directory written by ``satflow_tpu.train``; ``hf_hub:<repo>`` downloads a
    checkpoint directory from the HuggingFace hub first (the reference's
    prefix-loading surface, gated on huggingface_hub + network).
    """
    source, base = split_model_name(name)
    if source == "hf_hub":
        try:
            from huggingface_hub import snapshot_download
        except ImportError as e:
            raise ImportError(
                "hf_hub: model names need the huggingface_hub package"
            ) from e
        base = snapshot_download(repo_id=base)
        import glob
        import os

        if not os.path.exists(os.path.join(base, "hparams.json")):
            # Not a satflow_tpu checkpoint dir: fall back to torch .ckpt files
            # (the reference's hub checkpoints are Lightning files).
            ckpts = glob.glob(os.path.join(base, "*.ckpt")) + glob.glob(
                os.path.join(base, "*.pt")
            )
            if ckpts:
                base = ckpts[0]
                source = "torch"
            else:
                source = "local"
        else:
            source = "local"
    if source == "local":
        from satflow_tpu.train.checkpoint import load_model_from_checkpoint

        return load_model_from_checkpoint(base)
    if source == "torch":
        # reference-format Lightning .ckpt: weights + hyper_parameters
        # (reference tests/test_models.py:79-102 pretrained surface)
        from satflow_tpu.interop.lightning import load_lightning_checkpoint

        return load_lightning_checkpoint(base, **kwargs)
    cls = _model_entrypoint(base.lower())
    model = cls(**kwargs)
    if pretrained and checkpoint_path:
        from satflow_tpu.train.checkpoint import restore_params_into

        restore_params_into(model, checkpoint_path)
    return model


# ---------------------------------------------------------------------------
# Generic component registry (losses, optimizers, schedules reuse this shape).
# ---------------------------------------------------------------------------


class Registry:
    """A small named registry for factory functions."""

    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, Callable[..., Any]] = {}

    def register(self, name: str):
        def _register(fn: Callable[..., Any]):
            key = name.lower()
            if key in self._entries:
                raise ValueError(f"{self.kind} {key!r} already registered")
            self._entries[key] = fn
            return fn

        return _register

    def get(self, name: str) -> Callable[..., Any]:
        key = name.lower()
        if key not in self._entries:
            raise KeyError(
                f"Unknown {self.kind} {name!r}. Registered: {sorted(self._entries)}"
            )
        return self._entries[key]

    def create(self, name: str, **kwargs) -> Any:
        return self.get(name)(**kwargs)

    def names(self) -> List[str]:
        return sorted(self._entries)
