"""Orbax checkpointing: save/restore {params, model_state, opt_state, step} + config.

The TPU-native replacement for Lightning's ModelCheckpoint files (SURVEY §5.4):
every checkpoint embeds the model's hyperparameters (the reference's
``save_hyperparameters()``, e.g. reference satflow/models/conv_lstm.py:33) so
``create_model("local:<dir>")`` can rebuild the model and load weights — the
analog of the reference's ``hf_hub:`` checkpoint loading.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

HPARAMS_FILE = "hparams.json"


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(path: str, state, model, metrics: Optional[Dict[str, float]] = None):
    """Save a train state (weights + model state + step) and the model config."""
    path = _abs(path)
    os.makedirs(path, exist_ok=True)
    payload = {
        "params": jax.device_get(_params_of(state)),
        "model_state": jax.device_get(getattr(state, "model_state", {})) or {},
        "step": int(jax.device_get(state.step)),
    }
    ckptr = ocp.StandardCheckpointer()
    ckpt_path = os.path.join(path, "state")
    ckptr.save(ckpt_path, payload, force=True)
    ckptr.wait_until_finished()
    meta = {"hparams": model.hparams(), "metrics": metrics or {}}
    with open(os.path.join(path, HPARAMS_FILE), "w") as f:
        json.dump(meta, f, indent=2, default=float)


def restore_checkpoint(path: str) -> Dict[str, Any]:
    path = _abs(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(path, "state"))


def load_model_from_checkpoint(path: str):
    """Rebuild a model from a checkpoint dir and attach restored variables.

    Returns the model with ``model.restored_variables`` set to the variables dict
    ready for ``model.forward``.
    """
    from satflow_tpu.core.registry import create_model

    path = _abs(path)
    with open(os.path.join(path, HPARAMS_FILE)) as f:
        meta = json.load(f)
    hparams = dict(meta["hparams"])
    cls_name = hparams.pop("class")
    model = create_model(cls_name.lower(), **_ctor_kwargs(cls_name, hparams))
    payload = restore_checkpoint(path)
    model.restored_variables = {"params": payload["params"], **payload["model_state"]}
    return model


def restore_params_into(model, path: str):
    payload = restore_checkpoint(_abs(path))
    model.restored_variables = {"params": payload["params"], **payload["model_state"]}
    return model


def _ctor_kwargs(cls_name: str, hparams: Dict[str, Any]) -> Dict[str, Any]:
    import inspect

    from satflow_tpu.core.registry import get_model

    sig = inspect.signature(get_model(cls_name.lower()).__init__)
    names = set(sig.parameters)
    mapped = dict(hparams)
    if "output_channels" in mapped and "out_channels" in names:
        mapped["out_channels"] = mapped.pop("output_channels")
    return {k: v for k, v in mapped.items() if k in names}


def _params_of(state):
    if hasattr(state, "params"):
        return state.params
    return {"generator": state.g_params, "discriminator": state.d_params}
