"""satflow_tpu — a TPU-native (JAX/XLA/Pallas) satellite-video nowcasting framework.

Capability parity target: openclimatefix/satflow (see SURVEY.md). The package is a
from-scratch design: flax.linen modules in NHWC layout, ``lax.scan`` recurrences,
single-jit train steps sharded over a ``jax.sharding.Mesh``, Orbax checkpoints, and a
Hydra-style composable YAML config tree.

Subpackages
-----------
- ``core``:     config composition, model/loss registries, logging utilities.
- ``data``:     batch-file dataset protocol, fake-data backend, transforms, prefetch.
- ``nn``:       layer/op library (ConvLSTM/ConvGRU cells, axial attention, norms, ...).
- ``models``:   the model zoo (ConvLSTM, MetNet, Perceiver, GANs, U-Nets, ...).
- ``ops``:      numerical ops — SSIM/MS-SSIM, optical flow, Pallas kernels.
- ``parallel``: mesh construction and sharding helpers.
- ``train``:    train states, jitted steps, fit/test loops, callbacks, loggers.
- ``baseline``: optical-flow parity harness (reference satflow/baseline).
"""

from satflow_tpu.version import __version__  # noqa: F401
