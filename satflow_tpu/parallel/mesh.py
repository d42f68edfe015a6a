"""Device mesh + sharding helpers: the TPU-native replacement for DDP/DeepSpeed.

The reference scales with PyTorch-Lightning DDP over NCCL (reference
satflow/configs/trainer/ddp.yaml:1-6) and DeepSpeed ZeRO for optimizer-state
sharding (configs/trainer/deepspeed.yaml:51). Here parallelism is expressed once,
declaratively: a global ``jax.sharding.Mesh`` with axes

    ("data", "model")

- batch tensors are sharded over ``data`` (DP); gradient all-reduce is emitted by
  XLA as ICI ``psum`` from the sharded jit, no user collectives;
- optimizer/parameter state can additionally be sharded over ``data`` for
  ZeRO-style memory scaling (see ``satflow_tpu.parallel.zero``);
- ``model`` is available for spatial/tensor sharding of large activations.

Multi-host (the reference's ``num_nodes``) is the same mesh built from
``jax.devices()`` after ``jax.distributed.initialize`` — DCN axes outermost.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_GLOBAL_MESH: Optional[Mesh] = None
# When the trainer runs in spatial (DxM) mode, batches must arrive in HBM with
# H already sharded over the model axis — otherwise every train step pays an
# XLA SPMD "involuntary full rematerialization" (replicate-then-reshard) at
# the shard_map boundary. Bound together with the mesh by mesh_scope.
_SPATIAL_AXIS: Optional[str] = None


def make_mesh(
    axis_shapes: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the global mesh. Default: all devices on the ``data`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_shapes is None:
        axis_shapes = [n] + [1] * (len(axis_names) - 1)
    if int(np.prod(axis_shapes)) != n:
        raise ValueError(f"Mesh {axis_shapes} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(axis_shapes)
    return Mesh(dev_array, axis_names)


def get_mesh() -> Mesh:
    """Process-global mesh (created on first use)."""
    global _GLOBAL_MESH
    if _GLOBAL_MESH is None:
        _GLOBAL_MESH = make_mesh()
    return _GLOBAL_MESH


def set_mesh(mesh: Mesh) -> None:
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


@contextlib.contextmanager
def mesh_scope(mesh: Mesh, spatial_axis: Optional[str] = None):
    """Bind ``mesh`` as the process-global mesh for the duration of a block.

    Used by the trainer's spatial mode: the DxM mesh must be the global one
    while its loaders shard batches, but a PERMANENT rebind would silently
    change sharding for every later ``get_mesh()`` consumer in the process
    (e.g. a non-spatial fit after a spatial one would run D-way DP with
    M-way replication — an M-fold throughput loss with no error).

    ``spatial_axis`` additionally marks the mesh axis over which image-like
    batch leaves get their H dimension sharded by :func:`shard_batch` inside
    the scope — the host→HBM placement the spatial shard_map rollout
    consumes directly (no SPMD reshard at the mesh boundary)."""
    global _GLOBAL_MESH, _SPATIAL_AXIS
    prev, prev_sp = _GLOBAL_MESH, _SPATIAL_AXIS
    _GLOBAL_MESH = mesh
    _SPATIAL_AXIS = spatial_axis
    try:
        yield mesh
    finally:
        _GLOBAL_MESH = prev
        _SPATIAL_AXIS = prev_sp


def batch_sharding(mesh: Optional[Mesh] = None, axis: str = "data") -> NamedSharding:
    """Sharding for batch-leading tensors: shard dim 0 over the data axis."""
    mesh = mesh or get_mesh()
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Optional[Mesh] = None) -> NamedSharding:
    mesh = mesh or get_mesh()
    return NamedSharding(mesh, P())


def put_global(x, sharding: NamedSharding):
    """Place a host array onto a sharding that may span multiple processes.

    Multi-host meshes (after ``jax.distributed.initialize``) are not fully
    addressable from any one process; each process then contributes only its
    addressable shards of the (identical) host value via
    ``make_array_from_callback`` — the jax multi-controller idiom.
    """
    x = np.asarray(x)
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(
        # asarray(order="C") copies non-contiguous slices but, unlike
        # ascontiguousarray, preserves 0-d shapes (scalar opt-state leaves)
        x.shape, sharding, lambda idx: np.asarray(x[idx], order="C")
    )


def put_replicated(tree, mesh: Optional[Mesh] = None):
    """Replicate a host pytree over every device of a (possibly multi-host)
    mesh — the params/opt-state placement of the DP train step."""
    rep_sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: put_global(x, rep_sh), tree)


def shard_batch(batch, mesh: Optional[Mesh] = None,
                spatial_axis: Optional[str] = None):
    """Device-put a host batch pytree with dim-0 sharded over ``data``.

    This is the host→HBM boundary of the input pipeline (the reference's
    pin_memory + ``.cuda()`` copy, datamodules.py:87-96). Scalars and
    rank-0 leaves are replicated. Works on multi-host meshes: every process
    passes the same global batch and contributes its local shards.

    ``spatial_axis`` (default: the axis bound by ``mesh_scope`` — set by the
    trainer's ``spatial=DxM`` mode) additionally shards the H dimension of
    image-like leaves (H at dim ``ndim-3``: (B,T,H,W,C) and (B,H,W,C)) over
    that mesh axis, so the spatial shard_map rollout reads its rows in place
    instead of forcing an SPMD replicate-then-reshard of the whole batch at
    the mesh boundary every step. A dict-keyed leaf gets the spatial spec
    only when its key is a known image key (``sat_data``/``topo_data``) — a
    pure rank heuristic would silently H-"shard" e.g. the (B,10,T,2,2) NWP
    leaf on its T dim, reintroducing the per-step reshard this exists to
    remove. Bare (non-dict) arrays of rank ≥ 4 are assumed image-like.
    """
    mesh = mesh or get_mesh()
    if spatial_axis is None:
        spatial_axis = _SPATIAL_AXIS
    if spatial_axis is not None and spatial_axis not in mesh.axis_names:
        spatial_axis = None
    rep_sh = replicated_sharding(mesh)

    def put(path, x):
        x = np.asarray(x)
        batched = x.ndim > 0 and x.shape[0] % mesh.shape["data"] == 0
        if not batched and x.ndim > 0 and x.shape[0] > 1:
            # numerically fine but every device computes the FULL batch:
            # indistinguishable from healthy DP in the logs, so say it
            _warn_indivisible_once(x.shape[0], mesh.shape["data"])
        spec = [("data" if batched else None)] + [None] * max(0, x.ndim - 1)
        if (
            spatial_axis is not None
            and x.ndim >= 4
            and _spatial_leaf(path)
            and x.shape[x.ndim - 3] % mesh.shape[spatial_axis] == 0
        ):
            spec[x.ndim - 3] = spatial_axis
        if not any(spec):
            return put_global(x, rep_sh)
        return put_global(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map_with_path(put, batch)


# Leaves whose dim ndim-3 is really H (NHWC video / image); see shard_batch.
_SPATIAL_LEAF_KEYS = frozenset({"sat_data", "topo_data"})


def _spatial_leaf(path) -> bool:
    dict_keys = [p.key for p in path
                 if isinstance(p, jax.tree_util.DictKey)]
    if dict_keys:
        return dict_keys[-1] in _SPATIAL_LEAF_KEYS
    return True  # bare array / tuple-of-arrays call sites pass images


_WARNED_INDIVISIBLE = set()


def _warn_indivisible_once(batch_dim: int, data_axis: int) -> None:
    key = (batch_dim, data_axis)
    if key in _WARNED_INDIVISIBLE:
        return
    _WARNED_INDIVISIBLE.add(key)
    import logging

    logging.getLogger(__name__).warning(
        "batch dim %d is not divisible by the data axis (%d): the leaf is "
        "REPLICATED — every device computes the full batch, i.e. no DP "
        "speedup. Pick a batch size divisible by %d.",
        batch_dim, data_axis, data_axis,
    )
