"""StableHLO export: ship a trained nowcaster as ONE portable artifact.

The reference's deployment story ends at a Lightning checkpoint — serving a
model requires the full Python package (model classes, configs) at load time
(reference satflow/models/base.py register/load machinery). For production
TPU serving, satflow_tpu additionally exports the COMPILED function:
``jax.export`` serializes the jitted forward — weights baked in as
constants, shapes fixed — to a versioned StableHLO blob that any JAX host
(or a C++ PJRT runner) can execute without the model zoo, the config tree,
or even this package.

Notes:
- The artifact is platform-checked (``Exported.platforms``): export on the
  platform you will serve on, or pass ``platforms=["cpu", "tpu"]`` for a
  multi-platform artifact. On TPU the fused Pallas cells serialize as Mosaic
  custom calls; a CPU export takes the exact-XLA fallback path instead
  (``ops/pallas`` dispatchers gate on the backend).
- Like ``InferenceSession``, the batch dimension is FIXED at export time —
  pad requests to ``batch`` (a shape change would mean a recompile anyway).

CLI:
    python -m satflow_tpu.serve.export local:<ckpt_dir> model.shlo \\
        --batch 8 --history 7 --size 256 [--bf16]
"""

from __future__ import annotations

import json
import struct
from typing import Any, Optional, Sequence

import numpy as np

_MAGIC = b"SFXP0001"


def export_model(
    model,
    variables: Any,
    path: str,
    *,
    batch: int,
    history: Optional[int] = None,
    size: Optional[int] = None,
    channels: Optional[int] = None,
    dtype: Optional[Any] = None,
    out_dtype: Optional[Any] = None,
    platforms: Optional[Sequence[str]] = None,
) -> dict:
    """Serialize ``jit(model.forward)`` with baked-in weights to ``path``.

    Input geometry defaults come from the model hparams (``history_steps``/
    ``input_channels``); ``size`` (H=W) must be given unless the model
    records one. Returns the artifact's metadata dict.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    history = history or int(getattr(model, "history_steps", 0)) or 7
    channels = channels or int(getattr(model, "input_channels", 12))
    if size is None:
        size = int(getattr(model, "output_shape", 0)) or 256
    x_spec = jax.ShapeDtypeStruct(
        (batch, history, size, size, channels), jnp.float32
    )

    def fwd(x):
        if dtype is not None:
            x = x.astype(dtype)
        y = model.forward(variables, x)
        return y.astype(out_dtype or jnp.float32)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jex.export(jax.jit(fwd), **kwargs)(x_spec)
    blob = exported.serialize()
    meta = {
        "model": type(model).__name__,
        "in_shape": list(x_spec.shape),
        "out_shape": [int(d) for d in exported.out_avals[0].shape],
        "platforms": list(exported.platforms),
        "forecast_steps": int(getattr(model, "forecast_steps", 0)),
    }
    meta_b = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(meta_b)))
        f.write(meta_b)
        f.write(blob)
    return meta


class ExportedModel:
    """A deserialized artifact: ``.meta`` + ``__call__`` on numpy batches."""

    def __init__(self, meta: dict, exported):
        self.meta = meta
        self._exported = exported

    def __call__(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float32)
        want = tuple(self.meta["in_shape"])
        if x.shape != want:
            raise ValueError(
                f"exported artifact expects input {want}, got {x.shape} "
                "(the batch dimension is fixed at export time — pad)"
            )
        return np.asarray(self._exported.call(x))


def load_exported(path: str) -> ExportedModel:
    """Load an artifact written by :func:`export_model`.

    Needs only jax — no satflow_tpu model classes, registry, or configs."""
    from jax import export as jex

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a satflow_tpu export "
                             f"(magic {magic!r})")
        (n,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(n).decode())
        blob = f.read()
    return ExportedModel(meta, jex.deserialize(blob))


def main(argv: Optional[Sequence[str]] = None) -> None:
    import argparse

    from satflow_tpu.core.registry import create_model
    import satflow_tpu.models  # noqa: F401  (populate the registry)

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("source", help="model source, e.g. local:<ckpt_dir>")
    p.add_argument("out", help="output artifact path")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--history", type=int, default=None)
    p.add_argument("--size", type=int, default=None)
    p.add_argument("--channels", type=int, default=None)
    p.add_argument("--bf16", action="store_true",
                   help="compute in bfloat16 (output stays f32)")
    a = p.parse_args(argv)

    import jax.numpy as jnp

    model = create_model(a.source)
    if getattr(model, "is_gan", False):
        raise SystemExit("export supports forward models only (the GAN "
                         "samplers thread an RNG — serve them with "
                         "InferenceSession instead)")
    variables = getattr(model, "restored_variables", None)
    if variables is None:
        raise SystemExit(
            "model has no restored_variables; export from a checkpoint "
            "source (local:/torch:/hf_hub:)"
        )
    meta = export_model(
        model, variables, a.out, batch=a.batch, history=a.history,
        size=a.size, channels=a.channels,
        dtype=jnp.bfloat16 if a.bf16 else None,
    )
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
