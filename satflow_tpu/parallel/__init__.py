"""Parallelism: mesh construction and sharding helpers."""

from satflow_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    get_mesh,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
