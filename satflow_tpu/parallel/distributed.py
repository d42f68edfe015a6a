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

    wants_distributed = bool(
        (coordinator_address and num_processes)
        or os.environ.get("TPU_WORKER_HOSTNAMES")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if (coordinator_address and num_processes and num_processes > 1
            and process_id is None):
        # defaulting the rank would make EVERY host claim process 0: the
        # coordinator binds, the rest fail and (without this guard) would be
        # silently demoted to disconnected single-host runs
        raise ValueError(
            "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES are set but "
            "JAX_PROCESS_ID is missing — each host needs its unique rank"
        )
    try:
        if coordinator_address and num_processes:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id or 0,
            )
            _INITIALIZED = True
        elif wants_distributed:
            jax.distributed.initialize()
            _INITIALIZED = True
    except Exception as e:  # noqa: BLE001 - single-host fallback is valid...
        if wants_distributed:
            # ...but NOT silently when the env asked for a pod: a swallowed
            # failure here (e.g. "backend already initialized" from an eager
            # jax call before this ran) turns the pod into N disconnected
            # single-host runs with wrong global batch and no gradient sync.
            import logging

            logging.getLogger(__name__).error(
                "multi-host env detected but jax.distributed.initialize "
                "FAILED (%s: %s); continuing with the already-initialized "
                "backend. If this says the backend is already initialized, "
                "something touched jax before maybe_initialize_distributed().",
                type(e).__name__, e,
            )
        # The backend may already be up (e.g. an external launcher called
        # jax.distributed.initialize before us): querying it is safe now, so
        # still sync the rank-zero logging gate and report the real topology
        # instead of assuming single-host.
        try:
            from satflow_tpu.core.utils import set_logging_process_index

            set_logging_process_index(jax.process_index())
            return jax.process_count() > 1
        except Exception:  # noqa: BLE001 - no backend at all
            return False
    if _INITIALIZED:
        from satflow_tpu.core.utils import set_logging_process_index

        set_logging_process_index(jax.process_index())
    return _INITIALIZED and jax.process_count() > 1


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None
