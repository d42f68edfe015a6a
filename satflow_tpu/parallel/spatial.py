"""Spatial (H-axis) parallelism for the ConvLSTM rollout.

The reference has no tensor/sequence parallelism anywhere (SURVEY §2.6 — its
models are small CNNs and DP covers them), but the TPU design deliberately
leaves H/W shardable (§5.7): EUMETSAT full-disk MSG frames are 3712px, and at
that geometry one chip's HBM cannot hold the rollout activations. This module
turns "shardable" into a working scale-out path:

- The input's H axis is sharded over a mesh axis (default ``"model"``) with
  ``jax.shard_map``; params are replicated.
- Each ConvLSTM step exchanges ONE halo row of x and h with its H-neighbors
  via ``lax.ppermute`` (zeros arrive at the global edges — exactly the SAME
  conv's zero padding), runs the unmodified fused step kernel
  (:func:`satflow_tpu.ops.pallas.fused_convlstm_step.fused_convlstm_step`) on
  the locally halo-extended rows, and slices the two edge rows off. The
  Pallas kernel therefore runs intact per shard — no GSPMD partitioning of
  the custom kernel is needed, and the collective rides ICI.
- Per cell the overhead is 2 boundary rows of compute + two 1-row ppermutes;
  activation memory divides by the axis size.

``convlstm_spatial_forward`` is numerically equivalent to
``ConvLSTMCore.apply`` with fused cells (tests/test_sharding.py gates it on
an 8-device CPU mesh, where the step's exact XLA fallback runs — the halo
exchange and shard_map structure are identical on TPU).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from satflow_tpu.ops.pallas.fused_convlstm_step import fused_convlstm_step


def _exchange_halo(a: jax.Array, axis: str) -> Tuple[jax.Array, jax.Array]:
    """(B, Hl, W, C) local rows -> (row above, row below) from H-neighbors.

    ppermute delivers zeros to indices that receive nothing, so the first
    shard's top halo and the last shard's bottom halo are zero rows — the
    same-as-SAME-conv global boundary.
    """
    n = jax.lax.axis_size(axis)
    if n == 1:
        zero = jnp.zeros_like(a[:, :1])
        return zero, zero
    down = [(i, i + 1) for i in range(n - 1)]  # my last row -> next shard's top
    up = [(i + 1, i) for i in range(n - 1)]  # my first row -> prev shard's bottom
    top = jax.lax.ppermute(a[:, -1:], axis, down)
    bot = jax.lax.ppermute(a[:, :1], axis, up)
    return top, bot


def _cell_step(
    x: jax.Array,
    h: jax.Array,
    c: jax.Array,
    p: Dict[str, Any],
    axis: str,
    dtype,
) -> Tuple[jax.Array, jax.Array]:
    """One ConvLSTM cell on H-sharded rows: halo-extend, fused step, crop.

    The fused kernel zero-masks above/below its (local) first/last row; those
    two rows' outputs are computed on wrong boundaries and cropped — only the
    interior rows (the shard's real rows, with true neighbor halos) are kept.
    """
    hl = x.shape[1]
    xt, xb = _exchange_halo(x, axis)
    ht, hb = _exchange_halo(h, axis)
    # Zero rows appended below the bottom halo pad the extended height to a
    # multiple of 8 so the Pallas step runs on the sharded rows too (its
    # row-blocking needs height % 8 == 0); their outputs land beyond the
    # cropped range. The conv at the last real row reads the bottom halo,
    # never the filler.
    pad = (-(hl + 2)) % 8
    zrows = jnp.zeros((x.shape[0], pad, x.shape[2], x.shape[3]), x.dtype)
    hzrows = jnp.zeros((h.shape[0], pad, h.shape[2], h.shape[3]), h.dtype)
    x_ext = jnp.concatenate([xt, x, xb, zrows], axis=1)
    h_ext = jnp.concatenate([ht, h, hb, hzrows], axis=1)
    c_ext = jnp.pad(c, ((0, 0), (1, 1 + pad), (0, 0), (0, 0)))
    h2, c2 = fused_convlstm_step(
        x_ext.astype(dtype), h_ext.astype(dtype), c_ext.astype(dtype),
        p["x_gates_kernel"].astype(dtype), p["h_gates_kernel"].astype(dtype),
        p["bias"].astype(dtype),
    )
    return h2[:, 1 : hl + 1], c2[:, 1 : hl + 1]


def _head_apply(h4: jax.Array, head: Dict[str, Any], axis: str, dtype) -> jax.Array:
    """(1,3,3)-Conv3d-equivalent output head with halo rows (VALID on H)."""
    t, b = _exchange_halo(h4, axis)
    ext = jnp.concatenate([t, h4, b], axis=1)
    y = jax.lax.conv_general_dilated(
        ext.astype(dtype), head["kernel"].astype(dtype), (1, 1),
        ((0, 0), (1, 1)),  # H: VALID over the halo-extended rows; W: SAME
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + head["bias"].astype(dtype)


def _cell_params(params: Dict[str, Any]):
    """Extract the four cell + head param dicts from a fused ConvLSTMCore
    params tree (flat, chunked-remat, or folded-head layouts)."""
    enc = params["encoder"]
    dec = params["decoder"]
    if "steps" in enc:
        enc = enc["steps"]
    if "steps" in dec:
        dec = dec["steps"]
    head = dec.get("head", params.get("head"))
    if head is None:
        raise ValueError("params tree has no output head (expected "
                         "decoder/head or a top-level head)")
    for cell in ("encoder_1", "encoder_2"):
        if "x_gates_kernel" not in enc[cell]:
            raise ValueError(
                "spatial parallelism reads fused-cell params "
                "(x_gates_kernel/h_gates_kernel/bias); got cell keys "
                f"{sorted(enc[cell])} — build the model with cell_impl='fused'"
            )
    return enc["encoder_1"], enc["encoder_2"], dec["decoder_1"], dec["decoder_2"], head


def _local_rollout(
    params: Dict[str, Any],
    x: jax.Array,
    *,
    steps: int,
    axis: str,
    dtype,
) -> jax.Array:
    """Per-shard rollout body (runs under shard_map on local H rows)."""
    e1, e2, d1, d2, head = _cell_params(params)
    bsz, _, hl, w, _ = x.shape
    hid = e1["h_gates_kernel"].shape[2]
    cdtype = dtype or x.dtype
    z = jnp.zeros((bsz, hl, w, hid), cdtype)
    x = x.astype(cdtype)

    def enc_step(carry, xt):
        (h1, c1), (h2, c2) = carry
        h1, c1 = _cell_step(xt, h1, c1, e1, axis, cdtype)
        h2, c2 = _cell_step(h1, h2, c2, e2, axis, cdtype)
        return ((h1, c1), (h2, c2)), None

    carry, _ = jax.lax.scan(enc_step, ((z, z), (z, z)), jnp.moveaxis(x, 1, 0))
    (_, _), (h2, _) = carry

    def dec_step(carry, _):
        (h3, c3), (h4, c4), v = carry
        h3, c3 = _cell_step(v, h3, c3, d1, axis, cdtype)
        h4, c4 = _cell_step(h3, h4, c4, d2, axis, cdtype)
        out = _head_apply(h4, head, axis, cdtype)
        return ((h3, c3), (h4, c4), h4), out

    _, outs = jax.lax.scan(dec_step, ((z, z), (z, z), h2), None, length=steps)
    return jax.nn.sigmoid(jnp.moveaxis(outs, 0, 1))  # (B, steps, Hl, W, out)


def convlstm_spatial_forward(
    params: Dict[str, Any],
    x: jax.Array,
    forecast_steps: int,
    mesh,
    axis: str = "model",
    dtype: Optional[Any] = None,
) -> jax.Array:
    """H-sharded ConvLSTM rollout: (B, T, H, W, C) -> (B, steps, H, W, out).

    ``params`` is the ``params`` collection of a fused-cell
    :class:`~satflow_tpu.models.conv_lstm.ConvLSTMCore`; ``x``'s H axis is
    (re)sharded over ``mesh[axis]`` and each shard computes its rows with
    per-step halo exchange. H must divide evenly by the axis size.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[axis]
    if x.shape[2] % n:
        raise ValueError(
            f"H={x.shape[2]} must divide by the {axis!r} axis size {n}"
        )
    # DxM: the batch dim rides the data axis (plain DP) whenever it divides —
    # otherwise every device would recompute the full batch, an M-fold-masked
    # D-fold throughput loss. This spec also matches shard_batch's spatial
    # placement, so the jitted train step consumes loader batches in place
    # (no SPMD replicate-then-reshard at the shard_map boundary).
    bspec = (
        "data"
        if (
            "data" in mesh.axis_names
            and axis != "data"
            and x.shape[0] % mesh.shape["data"] == 0
        )
        else None
    )
    spec = P(bspec, None, axis)
    fn = functools.partial(
        _local_rollout, steps=forecast_steps, axis=axis, dtype=dtype
    )
    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), spec),
        out_specs=spec,
        check_vma=False,  # ppermute-based halos are deliberately non-replicated
    )
    target = NamedSharding(mesh, spec)
    if isinstance(x, jax.core.Tracer) or target.is_fully_addressable:
        # single-process mesh (or under jit, where device_put is a sharding
        # constraint): plain device_put keeps TPU-resident inputs on-device
        x = jax.device_put(x, target)
    else:
        # multi-process mesh: no one process can address every shard.
        sh = getattr(x, "sharding", None)
        # equivalence, not ==: a full-rank spec from shard_batch (e.g.
        # P('data',None,'model',None,None)) IS this target with trailing
        # Nones, but compares unequal — and feeding an already-placed
        # global jax.Array to put_global would np.asarray a
        # non-fully-addressable array and raise
        if sh is not None and isinstance(x, jax.Array):
            if not sh.is_equivalent_to(target, x.ndim):
                x = jax.device_put(x, target)
        else:
            # host value: each process contributes its local shards of the
            # (identical) host value
            from satflow_tpu.parallel.mesh import put_global

            x = put_global(x, target)
    return sharded(params, x)
