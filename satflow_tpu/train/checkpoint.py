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


def _opt_state_of(state):
    """Optimizer state(s) of a train state (per-optimizer for GANTrainState)."""
    if hasattr(state, "opt_state"):
        return state.opt_state
    return {"generator": state.g_opt_state, "discriminator": state.d_opt_state}


def save_checkpoint(path: str, state, model, metrics: Optional[Dict[str, float]] = None):
    """Save a train state (weights + model/opt state + step) and the model config.

    opt_state and step are included so resume restores Adam moments, schedule
    position, and step counters — the reference Lightning resume semantics
    (``resume_from_checkpoint``; Lightning checkpoints embed optimizer_states
    and global_step).
    """
    path = _abs(path)
    os.makedirs(path, exist_ok=True)
    payload = {
        "params": jax.device_get(_params_of(state)),
        "model_state": jax.device_get(getattr(state, "model_state", {})) or {},
        "opt_state": jax.device_get(_opt_state_of(state)),
        "step": int(jax.device_get(state.step)),
    }
    ckptr = ocp.StandardCheckpointer()
    ckpt_path = os.path.join(path, "state")
    ckptr.save(ckpt_path, payload, force=True)
    ckptr.wait_until_finished()
    meta = {"hparams": model.hparams(), "metrics": metrics or {}}
    with open(os.path.join(path, HPARAMS_FILE), "w") as f:
        json.dump(meta, f, indent=2, default=float)


def restore_checkpoint(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore a checkpoint payload.

    Without ``target``, containers come back as plain dicts/lists — fine for
    params/model_state, but optax states (namedtuples) lose their structure.
    Pass a template payload (e.g. built from a freshly-initialized train state)
    to restore opt_state with its original pytree structure.
    """
    path = _abs(path)
    ckptr = ocp.StandardCheckpointer()
    ckpt_path = os.path.join(path, "state")
    if target is None:
        payload = ckptr.restore(ckpt_path)
    else:
        payload = ckptr.restore(ckpt_path, target=jax.device_get(target))
    return payload


def resume_state(state, path: str, model=None):
    """Load a checkpoint into an already-built train state (params, model_state,
    opt_state, step) — the engine's resume_from_checkpoint path. ``model``
    enables layout adaptation of old checkpoints (see _adapt_params)."""
    template = {
        "params": _params_of(state),
        "model_state": getattr(state, "model_state", {}) or {},
        "opt_state": _opt_state_of(state),
        "step": 0,
    }
    try:
        payload = restore_checkpoint(path, target=template)
    except Exception as e:  # pre-r2 checkpoints lack opt_state, or the
        # optimizer structure changed (different wrapper/accumulation config)
        import logging

        logging.getLogger(__name__).warning(
            "resume: structured restore failed (%s: %s); falling back to "
            "params/model_state only — optimizer moments and schedule "
            "position will RESET", type(e).__name__, e,
        )
        payload = restore_checkpoint(path)
        payload["opt_state"] = None  # raw-dict opt_state is structurally unusable
    import jax.numpy as jnp

    step = jnp.asarray(payload.get("step", 0), jnp.int32)
    if model is not None and hasattr(state, "opt_state"):
        payload["params"] = _adapt_params(model, payload["params"])
    if hasattr(state, "opt_state"):
        state = state.replace(
            params=payload["params"], model_state=payload["model_state"], step=step
        )
        if payload["opt_state"] is not None:
            state = state.replace(opt_state=payload["opt_state"])
    else:
        state = state.replace(
            g_params=payload["params"]["generator"],
            d_params=payload["params"]["discriminator"],
            model_state=payload["model_state"],
            step=step,
        )
        if payload["opt_state"] is not None:
            state = state.replace(
                g_opt_state=payload["opt_state"]["generator"],
                d_opt_state=payload["opt_state"]["discriminator"],
            )
    return state, int(payload.get("step", 0))


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
    params = _adapt_params(model, payload["params"])
    model.restored_variables = {"params": params, **payload["model_state"]}
    return model


def _adapt_params(model, params):
    """Model hook for restoring params saved under an older layout (e.g. the
    ConvLSTM head's relocation when head_in_scan changed the param tree)."""
    hook = getattr(model, "adapt_restored_params", None)
    return hook(params) if hook is not None else params


def restore_params_into(model, path: str):
    payload = restore_checkpoint(_abs(path))
    params = _adapt_params(model, payload["params"])
    model.restored_variables = {"params": params, **payload["model_state"]}
    return model


def _ctor_kwargs(cls_name: str, hparams: Dict[str, Any]) -> Dict[str, Any]:
    import inspect

    from satflow_tpu.core.registry import get_model

    sig = inspect.signature(get_model(cls_name.lower()).__init__)
    names = set(sig.parameters)
    mapped = dict(hparams)
    if "output_channels" in mapped and "out_channels" in names:
        mapped["out_channels"] = mapped.pop("output_channels")
    if any(p.kind is p.VAR_KEYWORD for p in sig.parameters.values()):
        # ctor forwards **kwargs (HuggingFacePerceiver -> Perceiver); hparams
        # holds exactly the keys the chain accepts, so pass them all through
        return mapped
    return {k: v for k, v in mapped.items() if k in names}


def _params_of(state):
    if hasattr(state, "params"):
        return state.params
    return {"generator": state.g_params, "discriminator": state.d_params}
