"""Fused axial attention as a Pallas TPU kernel.

Axial attention (satflow_tpu/nn/attention.py) attends along ONE axis of length
L with every other dim folded into batch: per batch row it is
``softmax(q kᵀ / √d) v`` with (L, d) operands. XLA materializes the (N, h, L, L)
score tensor in HBM between the two matmuls; for the typical nowcasting shapes
(L ≤ 64, d ≤ 64, N = B·heads·other-axes in the thousands) that score tensor is
bigger than q/k/v combined. This kernel keeps scores in VMEM: one grid step
processes a tile of batch rows, computing qkᵀ → softmax → ·v without leaving
the chip.

Flag-gated with an exact XLA fallback (CPU tests and non-fitting shapes);
f32 internal math (bf16 transcendentals mis-lower in Mosaic, see fused_lstm).
Forward-only fusion: the backward pass uses the XLA fallback via custom VJP
residuals (attention backward is cheap relative to the convs around it).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from satflow_tpu.ops.pallas.fused_lstm import pallas_available

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None


def _attention_ref(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("nld,nmd->nlm", (q * scale).astype(jnp.float32),
                        k.astype(jnp.float32))
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("nlm,nmd->nld", weights, v.astype(jnp.float32)).astype(q.dtype)


def _kernel(q_ref, k_ref, v_ref, o_ref):
    # block: (TN, L, D); loop batch rows, full (L, L) scores in registers/VMEM
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    scale = q.shape[-1] ** -0.5
    tn = q.shape[0]
    for i in range(tn):  # static unroll over the row tile
        logits = jnp.dot(q[i] * scale, k[i].T, preferred_element_type=jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        o_ref[i, :, :] = jnp.dot(
            w, v[i], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                      row_tile: int = 8) -> jax.Array:
    n, L, d = q.shape
    row_tile = min(row_tile, n)
    grid = (pl.cdiv(n, row_tile),)
    spec = pl.BlockSpec((row_tile, L, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, L, d), q.dtype),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def axial_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, use_pallas: Optional[bool] = None
) -> jax.Array:
    """Batched single-axis attention: (N, L, D) q/k/v → (N, L, D).

    Pallas-fused on TPU when L and D fit a VMEM tile; exact XLA fallback
    otherwise (CPU, huge L).
    """
    use = use_pallas
    if use is None:
        # Regime sweep on v5e (tools/bench_axial.py, kernel-vs-XLA ms):
        #   N=98k L=64  d=8   16.1 / 19.9  -> XLA (thin heads: K=d too small)
        #   N=16k L=64  d=32   3.7 /  4.5  -> XLA
        #   N=4k  L=64  d=64   2.0 /  1.9  -> wash
        #   N=2k  L=128 d=64   3.1 /  1.8  -> kernel 1.77x
        #   N=2k  L=256 d=64   4.2 /  2.7  -> kernel 1.58x
        #   N=1k  L=64  d=128  1.3 /  1.4  -> XLA
        # The kernel wins when the (N, L, L) score tensor dominates the HBM
        # traffic: long axes with MXU-deep heads. Auto-enable there.
        use = q.shape[-2] >= 128 and q.shape[-1] >= 64
    if use and not (
        pallas_available()
        and q.shape == k.shape == v.shape
        and q.shape[-2] <= 512
        and q.shape[-1] <= 256
    ):
        use = False
    if use:
        return _attention_pallas(q, k, v)
    return _attention_ref(q, k, v)


def _fwd(q, k, v, use_pallas):
    out = axial_attention(q, k, v, use_pallas)
    return out, (q, k, v)


def _bwd(use_pallas, residuals, g):
    q, k, v = residuals
    # re-derive through the reference path; XLA fuses the backward fine
    _, vjp = jax.vjp(lambda q, k, v: _attention_ref(q, k, v), q, k, v)
    return vjp(g)


axial_attention.defvjp(_fwd, _bwd)
