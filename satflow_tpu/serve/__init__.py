"""Serving: compiled inference sessions + a micro-batching HTTP server.

The reference stops at training scripts; production nowcasting needs the
other half — load a checkpoint, compile the forward once, and serve
concurrent requests at high chip utilization. TPU-native specifics:

- one fixed-shape jitted forward (XLA recompiles on shape change, so requests
  are padded to the compiled batch size);
- cross-request micro-batching: concurrent requests coalesce into one forward
  (MXU efficiency comes from batch, see docs/DESIGN.md — the rollout bench
  scales ~1.3x from b16 to b56);
- zero host-side framework dependencies (stdlib http.server).
"""

from satflow_tpu.serve.session import InferenceSession, MicroBatcher
from satflow_tpu.serve.server import NowcastServer, serve
from satflow_tpu.serve.export import ExportedModel, export_model, load_exported

__all__ = [
    "ExportedModel",
    "InferenceSession",
    "MicroBatcher",
    "NowcastServer",
    "export_model",
    "load_exported",
    "serve",
]
