"""Recurrent spatial cells: ConvLSTM, ConvGRU, SpatioTemporalLSTM (PredRNN-v2).

TPU design: every cell is a pure flax module with the ``(carry, x) -> (carry, y)``
RNN-cell contract so temporal loops compile as a single ``lax.scan`` (weights hoisted
once, one fused XLA while-loop — replacing the reference's per-timestep Python loops
at reference satflow/models/conv_lstm.py:176-196). Layout is NHWC; the gate convs
are a single wide convolution so the MXU sees one large contraction per step, and the
gate nonlinearities fuse into its epilogue.

Behavioral parity:
- ConvLSTMCell   — reference satflow/models/layers/ConvLSTM.py:7-64 (fused 4-gate
  conv over concat(x, h); i,f,o,g split; c' = f*c + i*g; h' = o*tanh(c')).
- ConvGRUCell    — the reference imports a ConvGRU that is absent from the repo
  (reference satflow/models/layers/Generator.py:5); this supplies the standard
  DGMR-style gated conv recurrence (reset/update gates + candidate conv).
- SpatioTemporalLSTMCell — reference
  satflow/models/layers/SpatioTemporalLSTMCell_memory_decoupling.py:13-138
  (dual c/m memories, 7/4/3-way gate convs, forget bias 1.0, Δc/Δm outputs for
  the memory-decoupling loss).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from satflow_tpu.nn.conv import get_conv_layer

Carry = Any


def zeros_carry(batch: int, h: int, w: int, features: int, n: int, dtype=jnp.float32):
    """n-tuple of zero NHWC state tensors (reference ConvLSTM.py:59-64 init_hidden)."""
    return tuple(jnp.zeros((batch, h, w, features), dtype) for _ in range(n))


class ConvLSTMCell(nn.Module):
    """Fused-gate convolutional LSTM cell (NHWC).

    One conv over ``concat([x, h])`` producing ``4*features`` channels, split into
    input/forget/output/candidate gates in that order (ConvLSTM.py:48-57).
    """

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    use_bias: bool = True
    conv_type: str = "standard"
    fused_gates: bool = True  # Pallas fused gate/state update on TPU
    dtype: Any = None

    @nn.compact
    def __call__(self, carry: Tuple[jax.Array, jax.Array], x: jax.Array):
        h, c = carry
        conv = get_conv_layer(self.conv_type)
        gates = conv(
            features=4 * self.features,
            kernel_size=(self.kernel_size, self.kernel_size)
            if isinstance(self.kernel_size, int)
            else tuple(self.kernel_size),
            padding="SAME",
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="gates",
        )(jnp.concatenate([x, h], axis=-1))
        if self.fused_gates:
            from satflow_tpu.ops.pallas.fused_lstm import fused_lstm_gates

            h_next, c_next = fused_lstm_gates(gates, c.astype(gates.dtype))
        else:
            i, f, o, g = jnp.split(gates, 4, axis=-1)
            c_next = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
            h_next = nn.sigmoid(o) * jnp.tanh(c_next)
        return (h_next, c_next), h_next

    @staticmethod
    def init_carry(batch: int, h: int, w: int, features: int, dtype=jnp.float32):
        return zeros_carry(batch, h, w, features, 2, dtype)


class SplitConvLSTMCell(nn.Module):
    """ConvLSTM cell with split input/hidden gate convs (no concat).

    Mathematically identical to :class:`ConvLSTMCell` — a conv over
    ``concat([x, h])`` equals ``conv_x(x) + conv_h(h)`` — but TPU-friendlier:
    the (B, H, W, Cx+Ch) concat buffer is never materialized (saves a full
    HBM round-trip per step), the two convs keep clean channel tilings, and
    the input conv can be hoisted out of the scan entirely when the step
    inputs are known upfront (pass ``x_precomputed=True`` with
    ``precompute_input_gates``-produced activations — the encoder path of
    ConvLSTMCore).
    """

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    fused_gates: bool = True
    x_precomputed: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, carry: Tuple[jax.Array, jax.Array], x: jax.Array):
        h, c = carry
        ks = (self.kernel_size, self.kernel_size)
        if self.x_precomputed:
            xg = x  # already (B, H, W, 4C) from precompute_input_gates
        else:
            xg = nn.Conv(4 * self.features, ks, padding="SAME",
                         use_bias=self.use_bias, dtype=self.dtype,
                         name="x_gates")(x)
        hg = nn.Conv(4 * self.features, ks, padding="SAME", use_bias=False,
                     dtype=self.dtype, name="h_gates")(h)
        gates = xg + hg
        if self.fused_gates:
            from satflow_tpu.ops.pallas.fused_lstm import fused_lstm_gates

            h_next, c_next = fused_lstm_gates(gates, c.astype(gates.dtype))
        else:
            i, f, o, g = jnp.split(gates, 4, axis=-1)
            c_next = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
            h_next = nn.sigmoid(o) * jnp.tanh(c_next)
        return (h_next, c_next), h_next

    @staticmethod
    def init_carry(batch: int, h: int, w: int, features: int, dtype=jnp.float32):
        return zeros_carry(batch, h, w, features, 2, dtype)


class FusedConvLSTMCell(nn.Module):
    """ConvLSTM cell running the whole step in one Pallas kernel on TPU.

    Owns the same parameter geometry as :class:`SplitConvLSTMCell`
    (x_gates/h_gates 3×3 convs + bias) but dispatches to
    ``fused_convlstm_step`` — both convs, the gate math and the state update
    execute as one VMEM-resident kernel (exact XLA fallback elsewhere).
    """

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    #: padded_io: x and carry-h arrive (and h leaves) in (W+2)-padded layout,
    #: eliminating the per-step jnp.pad HBM round-trips inside scans (c stays
    #: unpadded — it is elementwise-only).
    padded_io: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, carry: Tuple[jax.Array, jax.Array], x: jax.Array):
        from satflow_tpu.ops.pallas.fused_convlstm_step import (
            fused_convlstm_step,
            fused_convlstm_step_padded,
        )

        h, c = carry
        k = self.kernel_size
        wx = self.param(
            "x_gates_kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], 4 * self.features),
        )
        wh = self.param(
            "h_gates_kernel", nn.initializers.lecun_normal(),
            (k, k, self.features, 4 * self.features),
        )
        b = (
            self.param("bias", nn.initializers.zeros_init(), (4 * self.features,))
            if self.use_bias
            else jnp.zeros((4 * self.features,), x.dtype)
        )
        cdtype = self.dtype or x.dtype
        step = fused_convlstm_step_padded if self.padded_io else fused_convlstm_step
        h_next, c_next = step(
            x.astype(cdtype), h.astype(cdtype), c.astype(cdtype),
            wx.astype(cdtype), wh.astype(cdtype), b.astype(cdtype),
        )
        return (h_next, c_next), h_next

    @staticmethod
    def init_carry(batch: int, h: int, w: int, features: int, dtype=jnp.float32):
        return zeros_carry(batch, h, w, features, 2, dtype)

    @staticmethod
    def init_carry_padded(batch: int, h: int, w: int, features: int,
                          dtype=jnp.float32):
        """(h padded to W+2, c unpadded) zero carry for padded_io cells."""
        return (
            jnp.zeros((batch, h, w + 2, features), dtype),
            jnp.zeros((batch, h, w, features), dtype),
        )


class InputGateConv(nn.Module):
    """The input-side gate conv of SplitConvLSTMCell, applied to a whole
    (B, T, H, W, C) sequence in one folded batch (hoisted out of the scan)."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x_seq: jax.Array) -> jax.Array:
        b, t = x_seq.shape[:2]
        frames = x_seq.reshape(b * t, *x_seq.shape[2:])
        xg = nn.Conv(4 * self.features,
                     (self.kernel_size, self.kernel_size), padding="SAME",
                     use_bias=self.use_bias, dtype=self.dtype, name="x_gates")(frames)
        return xg.reshape(b, t, *xg.shape[1:])


class ConvGRUCell(nn.Module):
    """Convolutional GRU cell (NHWC), the DGMR generator recurrence.

    Supplies the missing ``layers/ConvGRU.py`` dependency of reference
    satflow/models/layers/Generator.py:5. Reset/update gates from one fused conv
    over ``concat([x, h])``; candidate conv over ``concat([x, r*h])``. Optional
    spectral normalization on the convs for GAN use (DGMR uses SN ConvGRUs).
    """

    features: int
    kernel_size: int = 3
    sn: bool = False
    sn_stateless: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, carry: Tuple[jax.Array], x: jax.Array):
        import functools

        from satflow_tpu.nn.norm import SNConv

        (h,) = carry
        ks = (self.kernel_size, self.kernel_size)
        conv_cls = (
            functools.partial(SNConv, stateless=self.sn_stateless)
            if self.sn
            else nn.Conv
        )
        zr = conv_cls(features=2 * self.features, kernel_size=ks, padding="SAME",
                      dtype=self.dtype, name="gates")(jnp.concatenate([x, h], axis=-1))
        z, r = jnp.split(zr, 2, axis=-1)
        z, r = nn.sigmoid(z), nn.sigmoid(r)
        cand = conv_cls(features=self.features, kernel_size=ks, padding="SAME",
                        dtype=self.dtype, name="candidate")(
            jnp.concatenate([x, r * h], axis=-1)
        )
        h_next = (1.0 - z) * h + z * jnp.tanh(cand)
        return (h_next,), h_next

    @staticmethod
    def init_carry(batch: int, h: int, w: int, features: int, dtype=jnp.float32):
        return zeros_carry(batch, h, w, features, 1, dtype)


class SpatioTemporalLSTMCell(nn.Module):
    """PredRNN-v2 cell with memory decoupling (dual memories c and m).

    Gate math of SpatioTemporalLSTMCell_memory_decoupling.py:110-138: x contributes
    7 gate maps, h 4, m 3; spatial memory m flows zig-zag across layers; the cell
    returns (h', c', m') plus Δc, Δm used by the decoupling loss. ``layer_norm``
    normalizes each gate stack over the channel axis.
    """

    features: int
    kernel_size: int = 5
    layer_norm: bool = True
    forget_bias: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, x: jax.Array):
        h, c, m = carry
        ks = (self.kernel_size, self.kernel_size)

        def gate_conv(inp, mult, name):
            y = nn.Conv(features=mult * self.features, kernel_size=ks, padding="SAME",
                        use_bias=False, dtype=self.dtype, name=name)(inp)
            if self.layer_norm:
                y = nn.LayerNorm(dtype=self.dtype, name=f"{name}_ln")(y)
            return y

        x_cat = gate_conv(x, 7, "conv_x")
        h_cat = gate_conv(h, 4, "conv_h")
        m_cat = gate_conv(m, 3, "conv_m")

        i_x, f_x, g_x, i_xp, f_xp, g_xp, o_x = jnp.split(x_cat, 7, axis=-1)
        i_h, f_h, g_h, o_h = jnp.split(h_cat, 4, axis=-1)
        i_m, f_m, g_m = jnp.split(m_cat, 3, axis=-1)

        i_t = nn.sigmoid(i_x + i_h)
        f_t = nn.sigmoid(f_x + f_h + self.forget_bias)
        g_t = jnp.tanh(g_x + g_h)
        delta_c = i_t * g_t
        c_next = f_t * c + delta_c

        i_tp = nn.sigmoid(i_xp + i_m)
        f_tp = nn.sigmoid(f_xp + f_m + self.forget_bias)
        g_tp = jnp.tanh(g_xp + g_m)
        delta_m = i_tp * g_tp
        m_next = f_tp * m + delta_m

        mem = jnp.concatenate([c_next, m_next], axis=-1)
        o_t = nn.sigmoid(o_x + o_h + gate_conv(mem, 1, "conv_o"))
        h_next = o_t * jnp.tanh(
            nn.Conv(features=self.features, kernel_size=(1, 1), use_bias=False,
                    dtype=self.dtype, name="conv_last")(mem)
        )
        return (h_next, c_next, m_next), (h_next, delta_c, delta_m)

    @staticmethod
    def init_carry(batch: int, h: int, w: int, features: int, dtype=jnp.float32):
        return zeros_carry(batch, h, w, features, 3, dtype)


def scan_cell(cell_cls: Callable[..., nn.Module], **cell_kwargs):
    """Wrap a cell class so it scans over the time axis of a (B, T, H, W, C) input.

    Returns a module whose ``__call__(carry, xs)`` runs ``lax.scan`` with weights
    broadcast (hoisted out of the loop) — the compiled equivalent of the
    reference's per-timestep Python loops.
    """
    return nn.scan(
        cell_cls,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=1,
        out_axes=1,
    )(**cell_kwargs)
