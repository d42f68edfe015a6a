"""Multi-host initialization (the reference's ``num_nodes`` surface).

The reference exposes multi-node training through Lightning's ``num_nodes``
(reference satflow/configs/trainer/default.yaml:9, config stub only). On TPU
pods the equivalent is ``jax.distributed.initialize()`` before any backend use:
every host then sees the global device set and the same mesh construction code
(parallel.mesh) spans ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import os
from typing import Optional

_INITIALIZED = False


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when multi-host env/args are present.

    Autodetects TPU pod environments (jax.distributed.initialize() with no
    args works there); otherwise requires the explicit coordinator triplet
    (or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env).
    Returns True when running multi-host.
    """
    global _INITIALIZED
    if _INITIALIZED:
        import jax

        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    import jax

    try:
        if coordinator_address and num_processes:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id or 0,
            )
            _INITIALIZED = True
        elif os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()
            _INITIALIZED = True
    except Exception:  # noqa: BLE001 - single-host fallback is always valid
        return False
    return _INITIALIZED and jax.process_count() > 1


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None
