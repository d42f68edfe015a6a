"""Load reference-format Lightning .ckpt files into flax models.

The reference's checkpoints are pytorch-lightning files holding ``state_dict``
and ``hyper_parameters`` (written by ``save_hyperparameters()``, e.g. reference
satflow/models/conv_lstm.py:33). ``create_model("torch:<path.ckpt>")`` rebuilds
the matching flax model from those hyperparameters and converts the torch
weights through :mod:`satflow_tpu.interop.torch_weights` — the cross-ecosystem
analog of the reference's ``create_model("hf_hub:...")``.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional

# registry-name -> state_dict converter(model, state_dict) -> variables
_CONVERTERS: Dict[str, Callable] = {}


def register_converter(name: str):
    def _register(fn):
        _CONVERTERS[name.lower()] = fn
        return fn

    return _register


def _default_converters():
    # setdefault, not a truthiness early-return: a user-registered custom
    # converter must not suppress the built-ins for OTHER model names
    from satflow_tpu.interop.torch_weights import load_torch_convlstm

    _CONVERTERS.setdefault("encoderdecoderconvlstm", load_torch_convlstm)


def load_lightning_checkpoint(
    path: str,
    model_name: str = "encoderdecoderconvlstm",
    **overrides: Any,
):
    """Build a flax model from a Lightning .ckpt (weights + hyper_parameters).

    Hyperparameters from the checkpoint seed the constructor (overridable by
    kwargs); the state_dict converts through the model's registered torch
    converter. Returns the model with ``restored_variables`` set.
    """
    import torch

    from satflow_tpu.core.registry import get_model

    _default_converters()
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    hparams = dict(ckpt.get("hyper_parameters", {}) or {})
    hparams.update(overrides)

    name = str(hparams.pop("model_name", model_name)).lower()
    if name not in _CONVERTERS:
        raise NotImplementedError(
            f"No torch-weight converter registered for {name!r}; available: "
            f"{sorted(_CONVERTERS)}"
        )
    cls = get_model(name)
    sig = inspect.signature(cls.__init__)
    kwargs = {k: v for k, v in hparams.items() if k in sig.parameters}
    model = cls(**kwargs)
    _CONVERTERS[name](model, state_dict)
    return model
